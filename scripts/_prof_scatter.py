"""Scatter-formulation microbench: the per-event scatters are the device
lane's dominant cost (~7.5 ns/update measured; 2 scatters x m per
micro-step). Compares:

  A: two independent [W, H] scatters (current engine formulation)
  B: one windowed scatter into row-interleaved [2W, H] (rows 2x, 2x+1)
  C: one windowed scatter into lane-interleaved [W, 2H] (cols 2y, 2y+1)
  D: one scatter of half the updates (winner-only lower bound)
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

W = H = 320
m = 65536
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, W, m), jnp.int32)
y = jnp.asarray(rng.integers(0, H, m), jnp.int32)
v1 = jnp.asarray(rng.integers(1, 1 << 30, m), jnp.int32)
v2 = jnp.asarray(rng.integers(1, 1 << 30, m), jnp.int32)

REPS = 20


@jax.jit
def variant_a(a, b, x, y, v1, v2):
    for _ in range(REPS):
        a = a.at[x, y].set(v1, mode="drop", unique_indices=True)
        b = b.at[x, y].set(v2, mode="drop", unique_indices=True)
        v1 = v1 + 1
        v2 = v2 + 1
    return a, b


@jax.jit
def variant_b(ab, x, y, v1, v2):
    # ab: [2W, H]; one scatter writes rows (2x, 2x+1) at col y
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(0, 1))
    idx = jnp.stack([2 * x, y], axis=1)
    for _ in range(REPS):
        upd = jnp.stack([v1, v2], axis=1)          # [m, 2]
        ab = lax.scatter(ab, idx, upd, dnums,
                         indices_are_sorted=False, unique_indices=True,
                         mode=lax.GatherScatterMode.FILL_OR_DROP)
        v1 = v1 + 1
    return ab


@jax.jit
def variant_c(ab, x, y, v1, v2):
    # ab: [W, 2H]; one scatter writes cols (2y, 2y+1) at row x
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1))
    idx = jnp.stack([x, 2 * y], axis=1)
    for _ in range(REPS):
        upd = jnp.stack([v1, v2], axis=1)          # [m, 2]
        ab = lax.scatter(ab, idx, upd, dnums,
                         indices_are_sorted=False, unique_indices=True,
                         mode=lax.GatherScatterMode.FILL_OR_DROP)
        v1 = v1 + 1
    return ab


@jax.jit
def variant_d(a, x, y, v1):
    for _ in range(REPS):
        a = a.at[x, y].set(v1, mode="drop", unique_indices=True)
        v1 = v1 + 1
    return a


def bench(name, fn, *args):
    out = fn(*args)
    s = sum(float(jnp.sum(o)) for o in (out if isinstance(out, tuple)
                                        else (out,)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        s = sum(float(jnp.sum(o)) for o in (out if isinstance(out, tuple)
                                            else (out,)))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS / m * 1e9
    print(f"{name}: {best*1e3:7.2f} ms for {REPS} iters "
          f"-> {per:5.2f} ns per event-update-pair", flush=True)


a0 = jnp.zeros((W, H), jnp.int32)
b0 = jnp.zeros((W, H), jnp.int32)
ab_r = jnp.zeros((2 * W, H), jnp.int32)
ab_c = jnp.zeros((W, 2 * H), jnp.int32)

bench("A two scatters   ", variant_a, a0, b0, x, y, v1, v2)
bench("B rows-interleave", variant_b, ab_r, x, y, v1, v2)
bench("C cols-interleave", variant_c, ab_c, x, y, v1, v2)
bench("D single scatter ", variant_d, a0, x, y, v1)
print("done", flush=True)
