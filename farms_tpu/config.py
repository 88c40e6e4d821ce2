"""Configuration for the FARMS-TPU flow engine.

Exposes every tunable of the reference implementation, including constants
that are compiled-in there (reference: vFlow.cpp:73-74 windowJump/maxWindow,
vFlow.cpp:961 KILL_OLD_FLOW_TIME, vFlow.h:27-28 MAXSTAMP/TSTOSEC,
vFlow.cpp:1323 det threshold), plus TPU-specific batching/sharding knobs
that have no counterpart in the single-threaded reference.
"""
from __future__ import annotations

import dataclasses


def normalize_filter_size(filter_size: int) -> int:
    """Reference filter-size normalization (vFlow.cpp:32-33).

    Sizes below 5 collapse to 3; even sizes are decremented to odd.
    """
    if filter_size < 5:
        filter_size = 3
    if filter_size % 2 == 0:
        filter_size -= 1
    return filter_size


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Static configuration of the flow engine.

    All fields are hashable/static so a config can key a jit cache.
    """

    # --- sensor geometry (reference: main.cpp:21-22 defaults) ---
    width: int = 320
    height: int = 320

    # --- local plane fit (reference: main.cpp:23-24, vFlow.cpp:32-38) ---
    filter_size: int = 3          # odd neighborhood size k; patch is k x k
    min_evts_on_plane: int = 5    # inlier threshold to accept a plane

    # --- multi-scale aperture correction (reference: vFlow.cpp:73-74, 961) ---
    window_jump: int = 5          # scale stride
    max_window: int = 50          # largest half-window; scales = 0..max step jump
    kill_old_flow_time_us: int = 500  # freshness gate for pooling, microseconds

    # --- timestamp model (reference: vFlow.h:27-28) ---
    # Timestamps are unsigned 32-bit microseconds; differences are taken
    # modulo 2**32 and interpreted as signed (see ops/local_flow.py).
    ts_to_sec: float = 1e-6

    # --- plane-fit acceptance (reference: vFlow.cpp:1323) ---
    det_threshold: float = 1.0

    # --- TPU batching (no reference counterpart; chunk_size=1 reproduces
    #     the reference's strictly event-serial semantics) ---
    chunk_size: int = 2048        # events per micro-step (static shape)
    steps_per_scan: int = 8       # micro-steps fused into one lax.scan/jit call

    # Sub-phases per micro-step: the chunk's lanes split into this many
    # chronological groups, each scattered + flow-computed + pooled in
    # sequence within the same jit step. Cuts co-batch visibility error
    # (each phase sees every earlier phase's surface writes, and the
    # staleness kill re-runs at each phase start) at the cost of running
    # the dense stencil stages sub_phases times per chunk. chunk_size /
    # sub_phases is the effective causality granularity; see ACCURACY.md
    # for the measured error-vs-throughput frontier.
    sub_phases: int = 1

    # Aperture-stage phases per micro-step (dense path): 0 = one aperture
    # pass per sub-phase (the default coupling). A MULTIPLE of sub_phases
    # runs the pooling stage on finer chronological groups than the
    # plane-fit stage: each group re-applies the staleness kill at its own
    # start and pools with its own aperture pass, cutting the pooling
    # stage's co-batch visibility and stale-flow error (the AEE /
    # scale-match terms of ACCURACY.md) without paying extra plane-fit
    # passes. A DIVISOR of sub_phases runs pooling once per
    # sub_phases/aperture_sub_phases plane-fit groups: validity comes
    # from the plane fit alone, so fine plane-fit phasing with coarse
    # pooling keeps validity agreement at the fine granularity for a
    # fraction of uniform fine phasing's cost (the operating-point lever
    # behind the `fidelity` preset). Granularities:
    #   plane fit:  chunk_size / sub_phases
    #   aperture:   chunk_size / aperture_sub_phases
    aperture_sub_phases: int = 0

    # Causal visibility snapshots per sub-phase (dense path). The
    # batched error has two parts: NEIGHBOR VISIBILITY (a neighbor pixel
    # written several times within a group exposes only its pre/post
    # stamps to the causal view, so an intermediate write a center event
    # should see is missed - the dominant source of validity flips) and
    # CENTER ATTRIBUTION (non-winner events inherit the group winner's
    # fit). S > 1 scatters each sub-phase in S chronological sub-groups
    # and keeps every boundary surface; the plane-fit causal view folds
    # over all S+1 snapshots (newest value not in the center's future),
    # reproducing sub_phases*S visibility granularity from ONE dense
    # pass - ~2 extra VPU ops per support offset per snapshot instead of
    # S full stencil passes. Scatter volume is unchanged (S scatters of
    # 1/S the lanes). Granularities:
    #   neighbor visibility: chunk_size / (sub_phases * causal_snapshots)
    #   center attribution:  chunk_size / sub_phases
    causal_snapshots: int = 1

    # Rank-2 center-attribution correction (dense path). Non-final
    # events - pixels that fire again later in the same plane-fit group -
    # inherit the group winner's fit (the CENTER ATTRIBUTION term of the
    # batched error; ACCURACY.md). With center_correction = B > 0 the
    # host ships up to B "runner-up" lanes per chunk (the second-latest
    # event at each multiply-written pixel, latest chunk occurrence per
    # pixel), and the engine runs ONE extra dense plane-fit pass per
    # chunk whose center surface holds those events' own stamps, with
    # the causal-visibility fold running over the chunk's FULL
    # sub-group snapshot chain - so each corrected lane gets a fit
    # against its own stamp and its own visibility boundary, exactly
    # what the event-serial reference computes for it (vFlow.cpp:223-414)
    # up to the usual sub-group granularity. Rank >= 3 lanes (rare at
    # plane-fit granularity; < 0.6% on the structured stream at 32768)
    # and lanes past the budget keep inheriting the winner. Cost: one
    # dense pass + one B-lane scatter per chunk, independent of P.
    center_correction: int = 0

    # Correction-pass visibility chain granularity: False (default)
    # folds over EVERY sub-group boundary surface (P*S+1 entries -
    # corrected lanes see neighbors at the same chunk/(P*S) granularity
    # as pass 1); True keeps only plane-fit phase boundaries (P+1
    # entries), trading corrected-lane neighbor visibility (chunk/P) for
    # ~(S-1)*P fewer fold selects per support offset in the extra pass.
    correction_coarse_chain: bool = False

    # --- compute path selection ---
    # dense=True (default): per-pixel stencil formulation (ops/dense_flow.py)
    # - the TPU fast path; per-event random access is limited to the initial
    # scatter and a flat result gather. dense=False: per-event
    # gather formulation (ops/local_flow.py) - simpler, used as a reference.
    use_dense: bool = True

    # Fused Pallas kernels for the dense path's two hot stages
    # (ops/pallas/kernels.py). None = auto: use them whenever the derived
    # per-program VMEM estimate fits the 16 MB budget (true for all
    # BASELINE geometries; the kernels are gridded over row bands). False
    # forces the XLA dense formulation; True forces Pallas.
    use_pallas: bool | None = None

    # --- device->host wire format for per-event outputs ---
    # The engine ships 4 flow components + a validity/scale byte per event
    # and derives the magnitude/angle output columns (R/Theta local and
    # true, vFlow.cpp:370-396) on the host - they are pure functions of
    # the shipped components, and host<->device bandwidth, not compute, is
    # the end-to-end bottleneck (see bench.py's two lanes).
    #   "f32": vx, vy, true_vx, true_vy as f32 + 1 aux byte (17 B/event)
    #   "f16": both component pairs packed as f16 bit-halves (9 B/event);
    #          ~0.05% component quantization, validated against the
    #          accuracy budget at the benchmark operating point by
    #          tests/test_golden.py::test_chunked_accuracy_operating_point
    #   "sparse": validity-sparse f16 - the aux byte ships for every
    #          event (valid bit 7, present bit 6, scale id bits 0-5) but
    #          the f16 component pairs ship only for lanes that carry
    #          them: the raw vx/vy pair only where the plane fit accepted
    #          (elsewhere it is exactly 0, engine.py), the true pair only
    #          where valid (elsewhere derived as 0 host-side,
    #          vFlow.cpp:390-395). ~1 + 4*accept + 4*valid B/event - the
    #          e2e lane is D2H-bandwidth-bound and most streams are
    #          mostly-invalid (ACCURACY.md: 2.4% on the benchmark random
    #          stream). Engine-level compaction: pipeline/engine.py
    #          _sparse_pack_outputs.
    wire: str = "f32"

    # --- internal: padded device-array geometry (sharded engines) ---
    # Sharded engines pad the surface arrays up to a multiple of the mesh
    # extent; the semantic sensor stays width x height (all border rules -
    # patch in-bounds checks, aperture window clamping - use the semantic
    # bounds, and pad cells are never written, so outputs are identical to
    # the unpadded engine's; tests/test_tiling.py proves it). None = no
    # padding. Set via `FlowConfig.padded_to`, not by hand.
    padded_width: int | None = None
    padded_height: int | None = None

    # --- quirk toggles (reference defects catalogued in SURVEY.md SS2) ---
    # The reference clamps the aperture window's y-range with `width`
    # instead of `height` (vFlow.cpp:998-1000, 1111-1113). Harmless for
    # square sensors; wrong (UB reads) otherwise. Default: correct clamping.
    replicate_y_clamp_quirk: bool = False

    def __post_init__(self):
        object.__setattr__(
            self, "filter_size", normalize_filter_size(self.filter_size)
        )
        if self.sub_phases < 1 or self.chunk_size % self.sub_phases:
            raise ValueError(
                f"sub_phases {self.sub_phases} must be >= 1 and divide "
                f"chunk_size {self.chunk_size}")
        if self.aperture_sub_phases and (
                (self.aperture_sub_phases % self.sub_phases
                 and self.sub_phases % self.aperture_sub_phases)
                or self.chunk_size % self.aperture_sub_phases):
            raise ValueError(
                f"aperture_sub_phases {self.aperture_sub_phases} must be a "
                f"multiple or divisor of sub_phases {self.sub_phases} and "
                f"divide chunk_size {self.chunk_size}")
        if self.causal_snapshots < 1 or (
                self.chunk_size % (self.sub_phases * self.causal_snapshots)):
            raise ValueError(
                f"causal_snapshots {self.causal_snapshots} must be >= 1 "
                f"with sub_phases*causal_snapshots dividing chunk_size")
        if self.causal_snapshots > 1 and not self.use_dense:
            raise ValueError(
                "causal_snapshots > 1 is a dense-path feature (the "
                "per-event formulation has no snapshot fold)")
        if self.center_correction:
            if not self.use_dense:
                raise ValueError(
                    "center_correction is a dense-path feature (the "
                    "per-event formulation already attributes centers "
                    "exactly)")
            if self.center_correction < 0:
                raise ValueError("center_correction must be >= 0")
            if self.aperture_sub_phases > self.sub_phases:
                raise ValueError(
                    "center_correction requires aperture_sub_phases "
                    "equal to or a divisor of sub_phases (the deferred "
                    "merged-table lane assembly indexes one aperture "
                    "table per lane)")
        if self.wire not in ("f32", "f16", "sparse"):
            raise ValueError(
                f"wire must be 'f32', 'f16' or 'sparse', got {self.wire}")
        if self.num_scales > (63 if self.wire == "sparse" else 127):
            raise ValueError(
                "wire aux byte encodes the scale id in "
                f"{6 if self.wire == 'sparse' else 7} bits; "
                f"{self.num_scales} scales do not fit")
        if self.padded_width is not None and self.padded_width < self.width:
            raise ValueError("padded_width < width")
        if self.padded_height is not None and self.padded_height < self.height:
            raise ValueError("padded_height < height")
        if ((self.padded_width is not None or self.padded_height is not None)
                and not self.use_dense):
            raise ValueError(
                "padded array geometry is only supported on the dense "
                "compute path (the per-event gather path indexes with "
                "semantic coordinates)")

    def padded_to(self, tx: int, ty: int = 1) -> "FlowConfig":
        """This config with array dims rounded up to multiples of (tx, ty)."""
        pw = -(-self.width // tx) * tx
        ph = -(-self.height // ty) * ty
        return dataclasses.replace(
            self,
            padded_width=pw if pw != self.width else None,
            padded_height=ph if ph != self.height else None,
        )

    @property
    def array_width(self) -> int:
        """Device-array width (>= semantic sensor width)."""
        return self.padded_width if self.padded_width is not None else self.width

    @property
    def array_height(self) -> int:
        return (self.padded_height if self.padded_height is not None
                else self.height)

    # --- derived quantities (reference: vFlow.cpp:34-36) ---
    @property
    def f_rad(self) -> int:
        return self.filter_size // 2

    @property
    def plane_size(self) -> int:
        return self.filter_size * self.filter_size

    @property
    def num_scales(self) -> int:
        return self.max_window // self.window_jump + 1

    @property
    def scales(self) -> tuple[int, ...]:
        return tuple(range(0, self.max_window + 1, self.window_jump))

    @property
    def support_radius(self) -> int:
        """Half-width of the gather support covering all 9 candidate patches."""
        return 2 * self.f_rad

    @property
    def halo_width(self) -> int:
        """Surface halo a spatial tile needs from its neighbors."""
        return max(self.max_window, self.support_radius)
