// Native host-side helpers for sblas-tpu.
//
// The reference implements its host-side analysis passes in C++ (SURVEY.md
// C1/C7: mmio parsing, level-set construction). These are the TPU rebuild's
// equivalents: sequential O(nnz) passes that are pathological for numpy but
// trivial in C++. Built as a plain shared library, loaded via ctypes
// (pybind11 not available in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsblas_native.so sblas_native.cpp

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <cmath>

extern "C" {

// Level-set schedule for a lower-triangular CSR matrix (SURVEY.md C7).
// level[i] = 1 + max(level[j]) over off-diagonal dependencies j < i.
// Rows are topologically ordered by index for a lower-triangular matrix, so
// one forward sweep suffices. Returns the number of levels.
int32_t sblas_level_schedule_lower(const int32_t* indptr,
                                   const int32_t* indices,
                                   int64_t n,
                                   int32_t* levels) {
  int32_t nlevels = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t lvl = 0;
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int32_t j = indices[k];
      if (j < i) {
        int32_t cand = levels[j] + 1;
        if (cand > lvl) lvl = cand;
      }
    }
    levels[i] = lvl;
    if (lvl + 1 > nlevels) nlevels = lvl + 1;
  }
  return nlevels;
}

// Upper-triangular variant: backward sweep, deps are j > i.
int32_t sblas_level_schedule_upper(const int32_t* indptr,
                                   const int32_t* indices,
                                   int64_t n,
                                   int32_t* levels) {
  int32_t nlevels = 0;
  for (int64_t i = n - 1; i >= 0; --i) {
    int32_t lvl = 0;
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int32_t j = indices[k];
      if (j > i) {
        int32_t cand = levels[j] + 1;
        if (cand > lvl) lvl = cand;
      }
    }
    levels[i] = lvl;
    if (lvl + 1 > nlevels) nlevels = lvl + 1;
  }
  return nlevels;
}

// Fast MatrixMarket coordinate-body parser (SURVEY.md C1).
// Parses up to nnz lines of "row col [value]" from buf. Returns number of
// entries parsed, or -1 on malformed input. 1-based indices are converted to
// 0-based. If has_value == 0 values are set to 1.0.
int64_t sblas_parse_mtx_body(const char* buf, int64_t len, int64_t nnz,
                             int has_value, int32_t* rows, int32_t* cols,
                             double* vals) {
  const char* p = buf;
  const char* end = buf + len;
  int64_t count = 0;
  while (count < nnz && p < end) {
    // skip whitespace/newlines
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    if (*p == '%') {  // comment line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    char* next;
    long r = strtol(p, &next, 10);
    if (next == p) return -1;
    p = next;
    long c = strtol(p, &next, 10);
    if (next == p) return -1;
    p = next;
    double v = 1.0;
    if (has_value) {
      v = strtod(p, &next);
      if (next == p) return -1;
      p = next;
    }
    rows[count] = (int32_t)(r - 1);
    cols[count] = (int32_t)(c - 1);
    vals[count] = v;
    ++count;
  }
  return count;
}

// CSR forward substitution golden (serial, for validation parity with the
// reference's CPU goldens — SURVEY.md C12). x and b may alias.
void sblas_sptrsv_lower_f64(const int32_t* indptr, const int32_t* indices,
                            const double* data, int64_t n, const double* b,
                            double* x, int unit_diagonal) {
  for (int64_t i = 0; i < n; ++i) {
    double acc = b[i];
    double diag = 1.0;
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int32_t j = indices[k];
      if (j < i) {
        acc -= data[k] * x[j];
      } else if (j == i) {
        diag = data[k];
      }
    }
    x[i] = unit_diagonal ? acc : acc / diag;
  }
}

}  // extern "C"
