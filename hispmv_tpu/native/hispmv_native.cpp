// Native preprocessing hot paths.
//
// TPU-native analog of the reference's C++ host library (common/src/
// spmv-helper.cpp): the per-nnz encode/pack loops that dominate prepare()
// time.  Python drives everything; these functions do only the O(nnz)
// tight loops (MatrixMarket body parse, block-key sort, dense-block fill)
// that are 10-50x slower in numpy because of intermediate materialization.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MatrixMarket coordinate body parser: "row col [value]\n" lines.
// Returns number of entries parsed, or -1 on malformed input.
// rows/cols are 1-based in the file and converted to 0-based here
// (reference loadMtx contract, spmv-helper.cpp:34-136).
// ---------------------------------------------------------------------------
long long parse_mtx_body(const char* buf, long long len, long long expect,
                         int has_value, int32_t* out_rows, int32_t* out_cols,
                         float* out_vals) {
  const char* p = buf;
  const char* end = buf + len;
  long long n = 0;
  while (p < end && n < expect) {
    // skip whitespace/newlines
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    if (p >= end) break;
    char* next = nullptr;
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
    out_rows[n] = (int32_t)(r - 1);
    out_cols[n] = (int32_t)(c - 1);
    out_vals[n] = (float)v;
    ++n;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Block packing: given COO coordinates, compute the sorted unique
// (row_block, col_block) stream and scatter values into dense payloads.
//
// Phase 1 (pack_blocks_count): sorts an index array by block key and counts
// unique blocks.  Caller then allocates the output arrays.
// Phase 2 (pack_blocks_fill): emits block_rows/block_cols and the dense
// [nblocks, block_h, 128] payload (+= accumulates duplicate coordinates,
// matching numpy add.at semantics).
//
// The sorted order + per-nnz block index persist in an opaque handle
// between the two calls.
// ---------------------------------------------------------------------------

struct PackCtx {
  // (key, src index) pairs, sorted by key — contiguous pair sort is ~3x
  // faster than an index sort with indirect comparisons.
  std::vector<std::pair<int64_t, int64_t>> kv;
  int64_t nblocks;
};

void* pack_blocks_count(const int32_t* rows, const int32_t* cols,
                        long long nnz, int block_h, long long ncb,
                        long long* out_nblocks) {
  auto* ctx = new PackCtx();
  ctx->kv.resize(nnz);
  for (long long i = 0; i < nnz; ++i) {
    int64_t key = (int64_t)(rows[i] / block_h) * ncb + (cols[i] >> 7);
    ctx->kv[i] = {key, i};
  }
  std::sort(ctx->kv.begin(), ctx->kv.end());
  int64_t nb = nnz > 0 ? 1 : 0;
  for (long long i = 1; i < nnz; ++i)
    nb += ctx->kv[i].first != ctx->kv[i - 1].first;
  ctx->nblocks = nb;
  *out_nblocks = nb;
  return ctx;
}

// data must be zero-initialized [nblocks * block_h * 128] floats.
void pack_blocks_fill(void* ctx_ptr, const int32_t* rows, const int32_t* cols,
                      const float* vals, long long nnz, int block_h,
                      long long ncb, int32_t* out_block_rows,
                      int32_t* out_block_cols, float* out_data) {
  auto* ctx = (PackCtx*)ctx_ptr;
  int64_t bi = -1;
  int64_t prev_key = -1;
  for (long long i = 0; i < nnz; ++i) {
    int64_t key = ctx->kv[i].first;
    int64_t src = ctx->kv[i].second;
    if (key != prev_key) {
      ++bi;
      prev_key = key;
      out_block_rows[bi] = (int32_t)(key / ncb);
      out_block_cols[bi] = (int32_t)(key % ncb);
    }
    int r = rows[src] % block_h;
    int c = cols[src] & 127;
    out_data[(bi * block_h + r) * 128 + c] += vals[src];
  }
}

void pack_blocks_free(void* ctx_ptr) { delete (PackCtx*)ctx_ptr; }

}  // extern "C"
