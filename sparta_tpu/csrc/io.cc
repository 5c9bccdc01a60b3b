// Fast edge-list / MatrixMarket-body parser.
//
// The reference parses .el files with per-line std::string splitting
// (csr.cpp:218-264); python-side np.loadtxt is slower still.  This is a
// single-allocation mmap-free scanner: one pass counts data lines, a second
// fills caller-provided arrays.  C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC io.cc -o libsparta_io.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct FileBuf {
  char* data = nullptr;
  size_t size = 0;
  bool ok = false;
  explicit FileBuf(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    data = static_cast<char*>(malloc(size_t(n) + 1));
    if (data && fread(data, 1, size_t(n), f) == size_t(n)) {
      size = size_t(n);
      data[size] = '\0';
      ok = true;
    }
    fclose(f);
  }
  ~FileBuf() { free(data); }
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == ',')) p++;
  return p;
}

inline const char* parse_i64(const char* p, const char* end, int64_t* out,
                             bool* found) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); p++; }
  int64_t v = 0;
  const char* start = p;
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); p++; }
  *found = (p != start);
  *out = neg ? -v : v;
  return p;
}

}  // namespace

extern "C" {

// Count data lines (non-empty, not starting with # or %).
int64_t sparta_count_edges(const char* path) {
  FileBuf fb(path);
  if (!fb.ok) return -1;
  const char* p = fb.data;
  const char* end = fb.data + fb.size;
  int64_t count = 0;
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', size_t(end - p)));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q < line_end && *q != '#' && *q != '%') count++;
    p = line_end + 1;
  }
  return count;
}

// Parse up to n data lines: two int columns + optional float third column.
// skip_first: discard this many leading data lines (e.g. a size header).
// Returns number parsed; *max_fields = widest column count seen (2 or 3).
int64_t sparta_parse_edgelist(const char* path, int64_t skip_first, int64_t n,
                              int64_t* rows, int64_t* cols, double* vals,
                              int32_t* max_fields) {
  FileBuf fb(path);
  if (!fb.ok) return -1;
  const char* p = fb.data;
  const char* end = fb.data + fb.size;
  int64_t k = 0, seen = 0;
  *max_fields = 2;
  while (p < end && k < n) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', size_t(end - p)));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q < line_end && *q != '#' && *q != '%') {
      if (seen++ < skip_first) { p = line_end + 1; continue; }
      bool f1, f2;
      int64_t a, b;
      q = parse_i64(q, line_end, &a, &f1);
      q = parse_i64(q, line_end, &b, &f2);
      if (f1 && f2) {
        rows[k] = a;
        cols[k] = b;
        q = skip_ws(q, line_end);
        if (q < line_end) {
          char* endp = nullptr;
          double v = strtod(q, &endp);
          if (endp != q) {
            vals[k] = v;
            *max_fields = 3;
          } else {
            vals[k] = 1.0;
          }
        } else {
          vals[k] = 1.0;
        }
        k++;
      }
    }
    p = line_end + 1;
  }
  return k;
}

}  // extern "C"
