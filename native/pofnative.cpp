// Native data-path runtime: fast CSV parsing and LZF decompression.
//
// The reference's host data path leans on numpy text parsing
// (np.genfromtxt over DROW .csv/.odom2/.flow files) and a vendored
// python LZF decoder for binary_compressed PCDs — both orders of
// magnitude slower than necessary and squarely on the host critical
// path that feeds the TPU. This module provides C implementations
// exposed through a plain C ABI (loaded with ctypes; no pybind11
// dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC pofnative.cpp -o libpofnative.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>

namespace {

// Hand-rolled decimal float parser: ~10x faster than strtod (which is
// locale-aware). Handles [+-]ddd[.ddd][eE[+-]dd]; falls back to strtod for
// anything else (inf/nan/hex).
inline double parse_float(char*& p, char* end, bool& ok) {
  char* start = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  uint64_t mant = 0;
  int digits = 0;
  int exp10 = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    if (digits < 18) {
      mant = mant * 10 + static_cast<uint64_t>(*p - '0');
      ++digits;
    } else {
      ++exp10;  // drop excess integer digits, track magnitude
    }
    ++p;
  }
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') {
      if (digits < 18) {
        mant = mant * 10 + static_cast<uint64_t>(*p - '0');
        ++digits;
        --exp10;
      }
      ++p;
    }
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) {
      eneg = (*p == '-');
      ++p;
    }
    int e = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      e = e * 10 + (*p - '0');
      ++p;
    }
    exp10 += eneg ? -e : e;
  }
  if (digits == 0) {  // not a plain number (nan/inf/garbage): strtod
    char* next = nullptr;
    double v = std::strtod(start, &next);
    ok = next != start;
    p = ok ? next : start;
    return v;
  }
  static const double kPow10[] = {
      1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11, 1e12,
      1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};
  double v = static_cast<double>(mant);
  if (exp10 > 0) {
    v *= (exp10 <= 22) ? kPow10[exp10] : std::pow(10.0, exp10);
  } else if (exp10 < 0) {
    int e = -exp10;
    v /= (e <= 22) ? kPow10[e] : std::pow(10.0, e);
  }
  ok = true;
  return neg ? -v : v;
}

}  // namespace

extern "C" {

// Parse a comma/whitespace-separated numeric matrix.
// Returns 0 on success; caller frees *out_data with pof_free.
// All rows must have the same number of columns (first row defines it).
int pof_read_csv(const char* path, double** out_data, int64_t* out_rows,
                 int64_t* out_cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf[got] = '\0';

  // np.genfromtxt(delimiter=",") semantics: fields are comma-separated,
  // surrounding whitespace is stripped, an EMPTY field is NaN, and an
  // unparsable token is an error (-5) — never silently skipped.
  std::vector<double> vals;
  vals.reserve(got / 8);
  int64_t cols = 0, rows = 0;
  char* p = buf.data();
  char* end = buf.data() + got;
  const double kNaN = std::numeric_limits<double>::quiet_NaN();
  while (p < end) {
    // one line
    char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;
    // blank line (whitespace only)? skip it, like genfromtxt
    bool blank = true;
    for (char* q = p; q < line_end; ++q)
      if (*q != ' ' && *q != '\t' && *q != '\r') { blank = false; break; }
    if (!blank) {
      int64_t cur_cols = 0;
      char* f0 = p;
      while (true) {
        char* f1 = f0;
        while (f1 < line_end && *f1 != ',') ++f1;
        // trim field
        char* a = f0;
        char* b = f1;
        while (a < b && (*a == ' ' || *a == '\t' || *a == '\r')) ++a;
        while (b > a && (b[-1] == ' ' || b[-1] == '\t' || b[-1] == '\r')) --b;
        if (a == b) {
          vals.push_back(kNaN);  // empty field
        } else {
          bool ok = false;
          char* q = a;
          double v = parse_float(q, b, ok);
          if (!ok || q != b) return -5;  // unparsable token
          vals.push_back(v);
        }
        ++cur_cols;
        if (f1 >= line_end) break;
        f0 = f1 + 1;  // past the comma
      }
      if (cols == 0) cols = cur_cols;
      if (cur_cols != cols) return -2;  // ragged row
      ++rows;
    }
    p = line_end + 1;
  }
  if (rows == 0 || cols == 0) return -3;

  double* out = static_cast<double*>(
      std::malloc(sizeof(double) * static_cast<size_t>(rows * cols)));
  if (!out) return -4;
  std::memcpy(out, vals.data(), sizeof(double) * vals.size());
  *out_data = out;
  *out_rows = rows;
  *out_cols = cols;
  return 0;
}

void pof_free(void* ptr) { std::free(ptr); }

// LZF decompression (liblzf stream format, as used by PCL's
// binary_compressed PCD encoding). Returns decompressed size or -1.
int64_t pof_lzf_decompress(const uint8_t* in, int64_t in_len, uint8_t* out,
                           int64_t out_cap) {
  int64_t i = 0, o = 0;
  while (i < in_len) {
    uint32_t ctrl = in[i++];
    if (ctrl < 32) {  // literal run
      int64_t run = static_cast<int64_t>(ctrl) + 1;
      if (o + run > out_cap || i + run > in_len) return -1;
      std::memcpy(out + o, in + i, static_cast<size_t>(run));
      i += run;
      o += run;
    } else {  // back-reference
      int64_t len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return -1;
        len += in[i++];
      }
      if (i >= in_len) return -1;
      int64_t ref = o - static_cast<int64_t>((ctrl & 0x1f) << 8) - in[i++] - 1;
      if (ref < 0 || o + len + 2 > out_cap) return -1;
      // overlapping copy: must run forward byte-by-byte
      for (int64_t k = 0; k < len + 2; ++k) out[o + k] = out[ref + k];
      o += len + 2;
    }
  }
  return o;
}

}  // extern "C"
