// Native fast I/O for FARMS-TPU: event-file parsing and 11-column output
// formatting.
//
// The reference inlines its text I/O in the flow engine with
// getline+stringstream per event (reference vFlow.cpp:173-188) and ofstream
// formatting per row (vFlow.cpp:436-440); at 100M+ events that is a
// host-side bottleneck far larger than device compute. This library mmaps
// the input and scans it with a branch-light integer parser, and formats
// output rows into a large buffered arena.
//
// Exposed C ABI (consumed via ctypes from farms_tpu/utils/nativeio.py):
//   farms_count_lines(path)                      -> line count or -1
//   farms_parse_events(path, cap, x, y, t, p)    -> events parsed or -1
//   farms_write_flow(path, n, rows[11*n])        -> 0 on success
//   farms_pack_compact(...)                      -> 0 on success
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      fd = -1;
      return st.st_size == 0 && (data = "", size = 0, true);
    }
    size = static_cast<size_t>(st.st_size);
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      fd = -1;
      return false;
    }
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const char*>(p);
    return true;
  }

  ~MappedFile() {
    if (data && size) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// Parse a (possibly signed) decimal integer, skipping leading whitespace.
// Fractional tails ("123.000") are consumed and truncated toward zero,
// matching istream>>int followed by skipped garbage in practice.
inline const char* parse_int(const char* p, const char* end, long long* out) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  long long v = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
  }
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') ++p;
  }
  *out = neg ? -v : v;
  return p;
}

}  // namespace

extern "C" {

long long farms_count_lines(const char* path) {
  MappedFile f;
  if (!f.open(path)) return -1;
  long long lines = 0;
  const char* p = f.data;
  const char* end = f.data + f.size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) {
      ++lines;  // final line without trailing newline
      break;
    }
    ++lines;
    p = nl + 1;
  }
  return lines;
}

long long farms_parse_events(const char* path, long long cap, int32_t* x,
                             int32_t* y, uint32_t* t, int32_t* pol) {
  MappedFile f;
  if (!f.open(path)) return -1;
  const char* p = f.data;
  const char* end = f.data + f.size;
  long long n = 0;
  while (p < end && n < cap) {
    long long vx, vy, vt, vp;
    const char* q = p;
    q = parse_int(q, end, &vx);
    q = parse_int(q, end, &vy);
    q = parse_int(q, end, &vt);
    q = parse_int(q, end, &vp);
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (q > p) {
      x[n] = static_cast<int32_t>(vx);
      y[n] = static_cast<int32_t>(vy);
      t[n] = static_cast<uint32_t>(vt);
      pol[n] = static_cast<int32_t>(vp < 0 ? 0 : vp);  // vFlow.cpp:246-247
      ++n;
    }
    if (!nl) break;
    p = nl + 1;
  }
  return n;
}

// Format a double like C++ iostream's default (6 significant digits,
// integers without a decimal point) to match the reference's output files.
static char* fmt_value(char* o, double v) {
  if (std::isfinite(v) && v == static_cast<long long>(v) &&
      std::fabs(v) < 1e15) {
    o += sprintf(o, "%lld", static_cast<long long>(v));
  } else {
    o += sprintf(o, "%.6g", v);
  }
  return o;
}

int farms_write_flow(const char* path, long long n, const double* rows) {
  FILE* fp = fopen(path, "w");
  if (!fp) return -1;
  // arena-buffered writes, ~flushed every 4 MB
  static const size_t kArena = 4 << 20;
  char* buf = new char[kArena + 4096];
  size_t used = 0;
  for (long long i = 0; i < n; ++i) {
    const double* r = rows + i * 11;
    char* o = buf + used;
    // x y t p: integer columns
    o += sprintf(o, "%lld %lld %lld %lld ", (long long)r[0], (long long)r[1],
                 (long long)r[2], (long long)r[3]);
    for (int c = 4; c < 10; ++c) {
      o = fmt_value(o, r[c]);
      *o++ = ' ';
    }
    o += sprintf(o, "%lld\n", (long long)r[10]);
    used = o - buf;
    if (used >= kArena) {
      fwrite(buf, 1, used, fp);
      used = 0;
    }
  }
  if (used) fwrite(buf, 1, used, fp);
  delete[] buf;
  return fclose(fp) == 0 ? 0 : -1;
}

// Pack an event stream into the engine's compact device layout
// (pipeline/engine.py pack(compact=True)): int32 [steps, 2, m] where row 0
// is the clipped flat pixel index x*H + y with the micro-batch "winner"
// flag (last event at that pixel within its resolution block) in bit 30,
// and row 1 is the stamp normalized to t0. Lanes past `n` carry the
// out-of-range sentinel W*H (never winners) and the last stamp.
//
// `K` sub-divides each m-lane micro-batch into K equal winner-resolution
// blocks (K=1: whole-batch winners; K>1 feeds the engine's sub-phased
// aperture stage). The reference's last-write-wins surface semantics are
// vFlow.cpp:264-273; this replaces a per-block NumPy fancy-indexing loop
// with one linear pass.
int farms_pack_compact(long long n, const int32_t* x, const int32_t* y,
                       const uint32_t* t, uint32_t t0, int32_t W, int32_t H,
                       long long m, long long steps, int32_t K,
                       int32_t* out) {
  if (W <= 0 || H <= 0 || m <= 0 || steps <= 0) return -1;
  if (K <= 0 || m % K) K = 1;
  const long long B = m / K;          // winner-resolution block size
  if (m >= (1LL << 21)) return -1;    // lane index must fit the seen tag
  const int32_t sentinel = W * H;
  if (sentinel >= (1 << 30) || sentinel < 0) return -1;  // bit-30 flag room
  std::vector<int64_t> seen(static_cast<size_t>(sentinel) + 1, -1);
  const int32_t t_last =
      n ? static_cast<int32_t>(t[n - 1] - t0) : 0;
  long long tag = 0;
  for (long long s = 0; s < steps; ++s) {
    int32_t* w_row = out + s * 2 * m;
    int32_t* t_row = w_row + m;
    const long long base = s * m;
    for (long long j = 0; j < m; ++j) {
      const long long i = base + j;
      if (i < n) {
        int32_t xi = x[i];
        xi = xi < 0 ? 0 : (xi >= W ? W - 1 : xi);
        int32_t yi = y[i];
        yi = yi < 0 ? 0 : (yi >= H ? H - 1 : yi);
        w_row[j] = xi * H + yi;
        t_row[j] = static_cast<int32_t>(t[i] - t0);
      } else {
        w_row[j] = sentinel;
        t_row[j] = t_last;
      }
    }
    for (long long b0 = 0; b0 < m && base + b0 < n; b0 += B) {
      ++tag;
      long long hi = b0 + B;
      if (base + hi > n) hi = n - base;
      for (long long j = b0; j < hi; ++j)
        seen[w_row[j]] = (tag << 21) | j;
      for (long long j = b0; j < hi; ++j)
        if (seen[w_row[j]] == ((tag << 21) | j)) w_row[j] |= (1 << 30);
    }
  }
  return 0;
}

}  // extern "C"
