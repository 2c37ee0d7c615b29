// Native host kernels: bit-packed batched Pauli-frame propagation and GF(2)
// Gauss-Jordan elimination.
//
// The TPU compute path is JAX/XLA/Pallas; this translation unit covers the
// host-side runtime work the reference delegates to native code via Numba
// (reference src/noise/kernels.py, src/decoding/kernels.py:48-106): the
// decoding-matrix builder's fault-enumeration sweep (every fault = one bit
// lane, gates = word-wise XOR row ops) and a bit-packed GF(2) eliminator
// used as host oracle / fallback.
//
// Built on demand by qldpc_tpu/native/build.py (g++ -O3 -shared) and bound
// with ctypes; a NumPy fallback keeps the package functional without a
// toolchain.

#include <cstdint>
#include <cstring>

namespace {

constexpr int32_t OP_CNOT = 1;

inline void xor_row(uint64_t* dst, const uint64_t* src, int64_t W) {
  for (int64_t w = 0; w < W; ++w) dst[w] ^= src[w];
}

}  // namespace

extern "C" {

// Propagate `nbatch` error frames (packed 64/word along the batch axis)
// through the circuit. basis_z != 0: CNOT XORs target row into control row,
// `op_prep` resets, `op_meas` records (Z-frame rules, reference
// src/noise/kernels.py:50-89); else the X-frame mirror.
//
// state: (total_qubits, W) uint64, zero-initialized by the caller.
// syn:   (num_meas, W) uint64 output.
// Injections (sorted by pos ascending) flip bit `inj_bit[i]` of qubit row
// `inj_q[i]` immediately before executing gate index `inj_pos[i]`.
void propagate_frames(const int32_t* ops, const int32_t* q1,
                      const int32_t* q2, int64_t n_gates, int32_t basis_z,
                      int32_t op_prep, int32_t op_meas, int64_t W,
                      const int64_t* inj_pos, const int64_t* inj_q,
                      const int64_t* inj_bit, int64_t n_inj,
                      uint64_t* state, uint64_t* syn) {
  int64_t ptr = 0;
  int64_t syn_count = 0;
  for (int64_t i = 0; i < n_gates; ++i) {
    while (ptr < n_inj && inj_pos[ptr] == i) {
      state[inj_q[ptr] * W + (inj_bit[ptr] >> 6)] ^=
          (uint64_t{1} << (inj_bit[ptr] & 63));
      ++ptr;
    }
    const int32_t op = ops[i];
    if (op == OP_CNOT) {
      if (basis_z)
        xor_row(state + int64_t(q1[i]) * W, state + int64_t(q2[i]) * W, W);
      else
        xor_row(state + int64_t(q2[i]) * W, state + int64_t(q1[i]) * W, W);
    } else if (op == op_prep) {
      std::memset(state + int64_t(q1[i]) * W, 0, size_t(W) * 8);
    } else if (op == op_meas) {
      std::memcpy(syn + syn_count * W, state + int64_t(q1[i]) * W,
                  size_t(W) * 8);
      ++syn_count;
    }
  }
  while (ptr < n_inj) {
    state[inj_q[ptr] * W + (inj_bit[ptr] >> 6)] ^=
        (uint64_t{1} << (inj_bit[ptr] & 63));
    ++ptr;
  }
}

// Swap-free GF(2) Gauss-Jordan on a row-bit-packed matrix (columns packed
// 64/word). Eliminates the first `ncols` columns; returns the pivot row of
// each column in prow_of_col (-1 if none). A (m, W) uint64 and s (m) are
// reduced in place. Returns the number of pivots.
int64_t gf2_eliminate_packed(uint64_t* A, uint8_t* s, int64_t m, int64_t W,
                             int64_t ncols, int64_t* prow_of_col) {
  int64_t npiv = 0;
  // used-row bitmap
  bool* used = new bool[m]();
  for (int64_t col = 0; col < ncols; ++col) {
    const int64_t w = col >> 6;
    const uint64_t bit = uint64_t{1} << (col & 63);
    int64_t piv = -1;
    for (int64_t r = 0; r < m; ++r) {
      if (!used[r] && (A[r * W + w] & bit)) { piv = r; break; }
    }
    prow_of_col[col] = piv;
    if (piv < 0) continue;
    used[piv] = true;
    ++npiv;
    const uint64_t* prow = A + piv * W;
    const uint8_t ps = s[piv];
    for (int64_t r = 0; r < m; ++r) {
      if (r != piv && (A[r * W + w] & bit)) {
        xor_row(A + r * W, prow, W);
        s[r] ^= ps;
      }
    }
  }
  delete[] used;
  return npiv;
}

}  // extern "C"
