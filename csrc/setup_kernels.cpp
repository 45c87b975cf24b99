// Native setup-phase kernels for raptor_tpu.
//
// The reference implements its AMG setup in C++ (ruge_stuben/cf_splitting.cpp,
// aggregation/mis.cpp, aggregation/aggregate.cpp); these are the same
// sequential graph algorithms, exposed over a C ABI for ctypes. They must stay
// bit-identical to the Python implementations in
// raptor_tpu/ruge_stuben/cf_splitting.py and raptor_tpu/aggregation/ —
// tests/test_native.py asserts equality on the golden matrices.
//
// All CSR inputs are diagonal-stripped, sorted, int64 indices / double values.
// State constants follow core/types.hpp:29-35 (Selected=1, Unselected=0,
// Unassigned=-1, NewSelection=3, TmpSelection=4, NewUnselection=2).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

using i64 = int64_t;
using i8 = int8_t;

namespace {
constexpr i64 UNASSIGNED = -1;
constexpr i64 SELECTED = 1;
constexpr i64 UNSELECTED = 0;
constexpr i64 NEW_SELECTION = 3;
constexpr i64 NEW_UNSELECTION = 2;
constexpr i64 TMP_SELECTION = 4;
}

extern "C" {

// Classical RS first pass with bucket-queue ordering
// (cf_splitting.cpp:92-232 semantics).
void rs_first_pass(i64 n,
                   const i64* indptr, const i64* indices,
                   const i64* col_ptr, const i64* col_indices,
                   i64* weights, i64* states) {
    std::vector<i64> weight_sizes(n + 1, 0);
    for (i64 i = 0; i < n; i++) weight_sizes[weights[i]]++;
    std::vector<i64> weight_ptr(n + 1, 0);
    for (i64 i = 0; i < n; i++) weight_ptr[i + 1] = weight_ptr[i] + weight_sizes[i];
    std::fill(weight_sizes.begin(), weight_sizes.end(), 0);
    std::vector<i64> widx_to_col(n), col_to_widx(n);
    for (i64 i = 0; i < n; i++) {
        i64 w = weights[i];
        i64 idx = weight_ptr[w] + weight_sizes[w]++;
        widx_to_col[idx] = i;
        col_to_widx[i] = idx;
    }

    auto swap_pos = [&](i64 old_pos, i64 new_pos) {
        i64 a = widx_to_col[old_pos], b = widx_to_col[new_pos];
        col_to_widx[a] = new_pos;
        col_to_widx[b] = old_pos;
        widx_to_col[old_pos] = b;
        widx_to_col[new_pos] = a;
    };

    for (i64 i = n - 1; i >= 0; i--) {
        i64 col = widx_to_col[i];
        i64 w = weights[col];
        weight_sizes[w]--;
        if (states[col] != UNASSIGNED) continue;
        states[col] = SELECTED;
        for (i64 j = col_ptr[col]; j < col_ptr[col + 1]; j++) {
            i64 idx = col_indices[j];
            if (states[idx] != UNASSIGNED) continue;
            states[idx] = UNSELECTED;
            for (i64 k = indptr[idx]; k < indptr[idx + 1]; k++) {
                i64 idx_k = indices[k];
                if (states[idx_k] != UNASSIGNED) continue;
                i64 wk = weights[idx_k];
                if (wk >= n - 1) continue;
                i64 old_pos = col_to_widx[idx_k];
                i64 new_pos = weight_ptr[wk] + weight_sizes[wk] - 1;
                swap_pos(old_pos, new_pos);
                weight_sizes[wk] -= 1;
                weight_sizes[wk + 1] += 1;
                weight_ptr[wk + 1] = new_pos;
                weights[idx_k]++;
            }
        }
        for (i64 j = indptr[col]; j < indptr[col + 1]; j++) {
            i64 idx = indices[j];
            if (states[idx] != UNASSIGNED) continue;
            i64 w2 = weights[idx];
            if (w2 == 0) continue;
            i64 old_pos = col_to_widx[idx];
            i64 new_pos = weight_ptr[w2];
            swap_pos(old_pos, new_pos);
            weight_sizes[w2] -= 1;
            weight_sizes[w2 - 1] += 1;
            weight_ptr[w2] += 1;
            weight_ptr[w2 - 1] = weight_ptr[w2] - weight_sizes[w2 - 1];
            weights[idx]--;
        }
    }
}

// RS second pass (cf_splitting.cpp:234-284). Uses the FULL (diag-included)
// pattern.
void rs_second_pass(i64 n, const i64* indptr, const i64* indices,
                    i64* states) {
    std::vector<i64> row_coarse(n, -1);
    for (i64 i = 0; i < n; i++) {
        if (states[i] == SELECTED) continue;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 col = indices[j];
            if (states[col] == SELECTED) row_coarse[col] = i;
        }
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 col = indices[j];
            if (states[col] != UNSELECTED) continue;
            i64 sk = indptr[col], ek = indptr[col + 1];
            if (sk == ek) continue;
            bool connection = false;
            for (i64 k = sk; k < ek; k++) {
                if (row_coarse[indices[k]] == i) { connection = true; break; }
            }
            if (!connection) {
                row_coarse[col] = i;
                states[col] = SELECTED;
            }
        }
    }
}

static i64 select_independent_set(
        const i64* indptr, const i64* indices,
        const i64* col_ptr, const i64* col_indices,
        const std::vector<i64>& unassigned, i64 n_unassigned,
        i64* states, const double* weights, i64* new_coarse_list) {
    i64 n_new = 0;
    for (i64 ii = 0; ii < n_unassigned; ii++) {
        i64 u = unassigned[ii];
        double w = weights[u];
        bool blocked = false;
        for (i64 j = indptr[u]; j < indptr[u + 1]; j++)
            if (weights[indices[j]] > w) { blocked = true; break; }
        if (blocked) continue;
        for (i64 j = col_ptr[u]; j < col_ptr[u + 1]; j++)
            if (weights[col_indices[j]] > w) { blocked = true; break; }
        if (blocked) continue;
        states[u] = NEW_SELECTION;
        new_coarse_list[n_new++] = u;
    }
    return n_new;
}

static i64 update_states(std::vector<i64>& unassigned, i64 n_unassigned,
                         i64* states, double* weights) {
    i64 ctr = 0;
    for (i64 ii = 0; ii < n_unassigned; ii++) {
        i64 u = unassigned[ii];
        if (states[u] == NEW_SELECTION) {
            weights[u] = 0.0;
            states[u] = SELECTED;
        } else if (weights[u] < 1.0) {
            weights[u] = 0.0;
            states[u] = UNSELECTED;
        } else {
            unassigned[ctr++] = u;
        }
    }
    return ctr;
}

// CLJP main loop (cf_splitting.cpp:502-577). weights holds rand + indegree.
void cljp_main_loop(i64 n, i64 nnz,
                    const i64* indptr, const i64* indices,
                    const i64* col_ptr, const i64* col_indices,
                    i64* states, double* weights) {
    std::vector<i64> edgemark(nnz, 1);
    std::vector<i64> c_dep_cache(n, 0);
    std::vector<i64> unassigned;
    unassigned.reserve(n);
    for (i64 i = 0; i < n; i++)
        if (states[i] == UNASSIGNED) unassigned.push_back(i);
    std::vector<i64> new_coarse(n);
    i64 remaining = (i64)unassigned.size();

    while (remaining) {
        i64 n_new = select_independent_set(indptr, indices, col_ptr,
                                           col_indices, unassigned, remaining,
                                           states, weights, new_coarse.data());
        for (i64 ci = 0; ci < n_new; ci++) {
            i64 c = new_coarse[ci];
            for (i64 j = indptr[c]; j < indptr[c + 1]; j++) {
                i64 idx = indices[j];
                if (states[idx] == UNASSIGNED && edgemark[j]) {
                    edgemark[j] = 0;
                    weights[idx] -= 1;
                }
            }
        }
        for (i64 ci = 0; ci < n_new; ci++) {
            i64 c = new_coarse[ci];
            for (i64 j = col_ptr[c]; j < col_ptr[c + 1]; j++) {
                i64 idx = col_indices[j];
                if (states[idx] == UNASSIGNED) c_dep_cache[idx] = c;
            }
            for (i64 j = col_ptr[c]; j < col_ptr[c + 1]; j++) {
                i64 idx = col_indices[j];
                if (states[idx] == SELECTED) continue;
                for (i64 k = indptr[idx]; k < indptr[idx + 1]; k++) {
                    i64 idx_k = indices[k];
                    if (states[idx_k] == UNASSIGNED && edgemark[k]
                            && c_dep_cache[idx_k] == c) {
                        edgemark[k] = 0;
                        weights[idx_k] -= 1;
                    }
                }
            }
        }
        remaining = update_states(unassigned, remaining, states, weights);
    }
}

// PMIS main loop (cf_splitting.cpp:578-665).
void pmis_main_loop(i64 n,
                    const i64* indptr, const i64* indices,
                    const i64* col_ptr, const i64* col_indices,
                    i64* states, double* weights) {
    std::vector<i64> unassigned;
    unassigned.reserve(n);
    for (i64 i = 0; i < n; i++) {
        if (states[i] != UNASSIGNED) continue;
        if (weights[i] < 1) states[i] = UNSELECTED;
        else unassigned.push_back(i);
    }
    std::vector<i64> new_coarse(n);
    i64 remaining = (i64)unassigned.size();
    while (remaining) {
        i64 n_new = select_independent_set(indptr, indices, col_ptr,
                                           col_indices, unassigned, remaining,
                                           states, weights, new_coarse.data());
        for (i64 ci = 0; ci < n_new; ci++) {
            i64 c = new_coarse[ci];
            for (i64 j = col_ptr[c]; j < col_ptr[c + 1]; j++) {
                i64 row = col_indices[j];
                if (states[row] == UNASSIGNED) {
                    states[row] = UNSELECTED;
                    weights[row] = 0;
                }
            }
        }
        remaining = update_states(unassigned, remaining, states, weights);
    }
}

// MIS(2) (aggregation/mis.cpp:8-220). S pattern WITH diagonal, sorted.
void mis2(i64 n,
          const i64* indptr, const i64* indices,
          const i64* cindptr, const i64* cindices,
          const double* r, i64* states) {
    for (i64 i = 0; i < n; i++) states[i] = UNASSIGNED;
    // D: v -> col where r[v] > r[col]
    std::vector<i64> dptr(n + 1, 0), dind;
    dind.reserve(indptr[n]);
    for (i64 v = 0; v < n; v++) {
        for (i64 j = indptr[v]; j < indptr[v + 1]; j++) {
            i64 c = indices[j];
            if (r[v] > r[c]) dind.push_back(c);
        }
        dptr[v + 1] = (i64)dind.size();
    }
    std::vector<i64> V(n);
    for (i64 i = 0; i < n; i++) V[i] = i;
    std::vector<i64> C(n, 0), marked;
    i64 remaining = n;
    while (remaining) {
        for (i64 ii = 0; ii < remaining; ii++) {
            i64 v = V[ii];
            bool found = false;
            for (i64 j = dptr[v]; j < dptr[v + 1]; j++) {
                i64 w = dind[j];
                if (states[w] == UNASSIGNED || states[w] > SELECTED) {
                    found = true; break;
                }
            }
            if (!found) states[v] = TMP_SELECTION;
        }
        for (i64 ii = 0; ii < remaining; ii++) {
            i64 v = V[ii];
            if (states[v] != TMP_SELECTION) continue;
            bool found = false;
            for (i64 j = indptr[v]; j < indptr[v + 1] && !found; j++) {
                i64 w = indices[j];
                for (i64 k = indptr[w]; k < indptr[w + 1]; k++) {
                    i64 u = indices[k];
                    if (states[u] > SELECTED && r[u] > r[v]) {
                        found = true; break;
                    }
                }
            }
            if (!found) states[v] = NEW_SELECTION;
        }
        marked.clear();
        for (i64 ii = 0; ii < remaining; ii++) {
            i64 v = V[ii];
            if (states[v] != NEW_SELECTION) continue;
            for (i64 j = cindptr[v]; j < cindptr[v + 1]; j++) {
                i64 w = cindices[j];
                if (!C[w]) { C[w] = 1; marked.push_back(w); }
            }
        }
        for (i64 ii = 0; ii < remaining; ii++) {
            i64 v = V[ii];
            if (states[v] == NEW_SELECTION) continue;
            bool found = false;
            for (i64 j = indptr[v]; j < indptr[v + 1]; j++) {
                i64 w = indices[j];
                if (states[w] == NEW_SELECTION || C[w]) { found = true; break; }
            }
            if (found) states[v] = NEW_UNSELECTION;
        }
        for (i64 w : marked) C[w] = 0;
        i64 ctr = 0;
        for (i64 ii = 0; ii < remaining; ii++) {
            i64 v = V[ii];
            if (states[v] == NEW_SELECTION) states[v] = SELECTED;
            else if (states[v] == NEW_UNSELECTION) states[v] = UNSELECTED;
            else V[ctr++] = v;
        }
        remaining = ctr;
    }
}

// Aggregation (aggregation/aggregate.cpp:6-95). S/A sorted, full pattern.
i64 aggregate(i64 n,
              const i64* s_indptr, const i64* s_indices,
              const i64* a_indptr, const i64* a_indices, const double* a_data,
              const i64* states, const double* r, i64* aggregates) {
    for (i64 i = 0; i < n; i++) aggregates[i] = -1;
    i64 n_aggs = 0;
    for (i64 i = 0; i < n; i++)
        if (states[i] > 0) aggregates[i] = n_aggs++;
    for (i64 i = 0; i < n; i++) {
        if (states[i] > 0) continue;
        for (i64 j = s_indptr[i]; j < s_indptr[i + 1]; j++) {
            i64 col = s_indices[j];
            if (states[col] > 0) { aggregates[i] = aggregates[col]; break; }
        }
    }
    for (i64 i = 0; i < n; i++) {
        if (aggregates[i] >= 0) continue;
        double max_val = 0.0;
        i64 max_agg = -1;
        i64 ctr = a_indptr[i];
        for (i64 j = s_indptr[i]; j < s_indptr[i + 1]; j++) {
            i64 col = s_indices[j];
            while (a_indices[ctr] != col) ctr++;
            double val = (a_data[ctr] < 0 ? -a_data[ctr] : a_data[ctr])
                         + r[col];
            if (val > max_val && aggregates[col] >= 0) {
                max_val = val;
                max_agg = aggregates[col];
            }
        }
        aggregates[i] = -(max_agg + 1);
    }
    for (i64 i = 0; i < n; i++)
        if (aggregates[i] < 0) aggregates[i] = -(aggregates[i] + 1);
    return n_aggs;
}

}  // extern "C"

extern "C" {

// Mark A's entry positions that appear in S's off-diagonal pattern
// (both CSR, sorted; S pattern subset of A pattern).
void mark_strong(i64 n,
                 const i64* a_indptr, const i64* a_indices,
                 const i64* s_indptr, const i64* s_indices,
                 i8* strong) {
    for (i64 i = 0; i < n; i++) {
        i64 aj = a_indptr[i];
        for (i64 sj = s_indptr[i]; sj < s_indptr[i + 1]; sj++) {
            i64 sc = s_indices[sj];
            if (sc == i) continue;
            while (a_indices[aj] != sc) aj++;
            strong[aj] = 1;
        }
    }
}

// Modified classical interpolation (interpolation.cpp:206-441 semantics;
// bit-identical to the Python implementation in
// raptor_tpu/ruge_stuben/interpolation.py). Outputs triplets with ORIGINAL
// column ids; caller maps to coarse indices. Buffers sized >= a_nnz + n.
i64 mod_classical_interp(i64 n,
                         const i64* a_indptr, const i64* a_indices,
                         const double* a_data,
                         const i8* strong, const i64* states,
                         const i64* variables, i64 num_variables,
                         i64* out_rows, i64* out_cols, double* out_vals) {
    const double ZERO_TOL = 1e-16;
    std::vector<double> weak_sums(n, 0.0);
    std::vector<double> sign(n, 1.0);
    for (i64 i = 0; i < n; i++) {
        double diag = 0.0;
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++)
            if (a_indices[j] == i) { diag = a_data[j]; break; }
        weak_sums[i] = diag;
        if (diag < 0) sign[i] = -1.0;
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 c = a_indices[j];
            if (c == i || strong[j]) continue;
            // NoNeighbors columns never reach the weak sum
            // (par_interpolation.cpp:1327)
            if (states[c] == -2) continue;
            if (num_variables == 1 || variables[i] == variables[c])
                weak_sums[i] += a_data[j];
        }
    }

    // Per-entry flag bytes (ONE sequential pass) replace the random
    // states[] loads inside the distance-2 scans: bit0 strong, bit1
    // column SELECTED and != owning row, bit2 value < 0, bit3 value > 0.
    // The sign test v*sgn<0 with sgn = +-1.0 is exactly (v<0) for sgn>0
    // and (v>0) for sgn<0 (IEEE: products with +-1.0 are exact), so the
    // caller-side row sign just selects which bit to test.
    i64 nnz_a = a_indptr[n];
    std::vector<i8> flags(nnz_a);
    for (i64 i = 0; i < n; i++)
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 c = a_indices[j];
            double v = a_data[j];
            i8 f = (i8)(strong[j] != 0);
            if (c != i && states[c] == SELECTED) f |= 2;
            if (v < 0) f |= 4;
            else if (v > 0) f |= 8;
            flags[j] = f;
        }

    std::vector<i64> pos(n, -1), stamp(n, -1);
    i64 nnz = 0;
    for (i64 i = 0; i < n; i++) {
        if (states[i] == SELECTED) {
            out_rows[nnz] = i; out_cols[nnz] = i; out_vals[nnz++] = 1.0;
            continue;
        }
        i64 row_start = nnz;
        // strong-C entries seed the row pattern with A's values
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 c = a_indices[j];
            if (!strong[j] || states[c] != SELECTED) continue;
            pos[c] = nnz; stamp[c] = i;
            out_rows[nnz] = i; out_cols[nnz] = c; out_vals[nnz++] = a_data[j];
        }
        double weak_sum = weak_sums[i];
        // distribute strong-F values over shared coarse entries; the
        // sign filter uses the NEIGHBOR's diagonal sign and a tiny
        // coarse sum still distributes its raw value (parallel
        // semantics, par_interpolation.cpp:1255-1292 — the serial
        // interpolation.cpp:206-441 differs on both)
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 col = a_indices[j];
            if (!strong[j] || states[col] != UNSELECTED) continue;
            i8 negbit = sign[col] < 0 ? 8 : 4;  // v*sgn_k<0 <=> flag bit
            i8 want = (i8)(2 | negbit);  // SELECTED non-diag, sign-ok
            double cs = 0.0;
            for (i64 k = a_indptr[col]; k < a_indptr[col + 1]; k++) {
                if ((flags[k] & want) != want) continue;
                i64 ck = a_indices[k];
                if (stamp[ck] == i) cs += a_data[k];
            }
            double ratio;
            if (cs < ZERO_TOL && cs > -ZERO_TOL) {
                weak_sum += a_data[j];
                ratio = cs;            // raw tiny multiplier (:1292)
            } else {
                ratio = a_data[j] / cs;
            }
            if (ratio != 0.0) {
                for (i64 k = a_indptr[col]; k < a_indptr[col + 1]; k++) {
                    if ((flags[k] & want) != want) continue;
                    i64 ck = a_indices[k];
                    if (stamp[ck] == i)
                        out_vals[pos[ck]] += ratio * a_data[k];
                }
            }
        }
        for (i64 t = row_start; t < nnz; t++) out_vals[t] /= -weak_sum;
    }
    return nnz;
}

// Extended+i interpolation with the PRODUCTION (parallel) semantics of
// par_interpolation.cpp:301-1010 (what ParRugeStubenSolver runs; the
// serial interpolation.cpp:9-205 differs in convergence-relevant ways:
// weak-in-pattern entries fold into P, NoNeighbors weak exclusion,
// zero-weak-sum division guard, no distribution on zero coarse_sum).
// Matches the Python implementation bit-for-bit. Buffers sized by the
// caller (dist-2 pattern).
i64 extended_interp(i64 n,
                    const i64* a_indptr, const i64* a_indices,
                    const double* a_data,
                    const i8* strong, const i64* states,
                    const i64* variables, i64 num_variables,
                    i64* out_rows, i64* out_cols, double* out_vals) {
    const double ZERO_TOL = 1e-16;
    std::vector<double> diag(n, 0.0);
    for (i64 i = 0; i < n; i++)
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++)
            if (a_indices[j] == i) { diag[i] = a_data[j]; break; }

    // Per-entry flag bytes (ONE sequential pass) replace the random
    // states[] loads inside the distance-2 scans: bit0 strong, bit1
    // column SELECTED, bit2 value < 0, bit3 value > 0 (v*sgn<0 with
    // sgn = +-1.0 is exactly v<0 / v>0, so the strong-F row's diagonal
    // sign just selects which bit to test), bit4 column UNSELECTED.
    i64 nnz_a = a_indptr[n];
    std::vector<i8> flags(nnz_a);
    for (i64 t = 0; t < nnz_a; t++) {
        double v = a_data[t];
        i64 st = states[a_indices[t]];
        i8 f = (i8)(strong[t] != 0);
        if (st == SELECTED) f |= 2;
        else if (st == UNSELECTED) f |= 16;
        if (v < 0) f |= 4;
        else if (v > 0) f |= 8;
        flags[t] = f;
    }
    // per-row negbit (which sign bit means v*sgn_row < 0)
    std::vector<i8> nb(n);
    for (i64 i = 0; i < n; i++) nb[i] = diag[i] < 0 ? 8 : 4;

    // stamp and row-relative position MERGED into one word: the
    // membership test inside the distance-2 scans is the kernel's hot
    // random access — one 8-byte load instead of two (pos < 2^32: a
    // P row is at most the pattern bound, far under it).
    std::vector<i64> ps(n, -1);
    i64 nnz = 0;
    for (i64 i = 0; i < n; i++) {
        if (states[i] == SELECTED) {
            out_rows[nnz] = i; out_cols[nnz] = i; out_vals[nnz++] = 1.0;
            continue;
        }
        i64 row_start = nnz;
        const i64 tag = i;
        // pattern: strong C of i, plus strong C of strong F neighbors
        // (values all 0.0; the single A pass below fills them)
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 col = a_indices[j];
            i8 fj = flags[j];
            if (!(fj & 1)) continue;
            if (fj & 2) {
                if ((ps[col] >> 32) != tag) {
                    ps[col] = (tag << 32) | (i64)(uint32_t)(nnz - row_start);
                    out_rows[nnz] = i; out_cols[nnz] = col;
                    out_vals[nnz++] = 0.0;
                }
            } else if (fj & 16) {
                // strong-C entries of row col: one flag byte per entry
                for (i64 k = a_indptr[col]; k < a_indptr[col + 1]; k++) {
                    if ((flags[k] & 3) != 3) continue;
                    i64 ck = a_indices[k];
                    if ((ps[ck] >> 32) != tag) {
                        ps[ck] = (tag << 32)
                                 | (i64)(uint32_t)(nnz - row_start);
                        out_rows[nnz] = i; out_cols[nnz] = ck;
                        out_vals[nnz++] = 0.0;
                    }
                }
            }
        }
        i64 row_end = nnz;
        // single A pass (par_interpolation.cpp:719-841): pattern
        // columns (strong C or weak alike) accumulate into P; strong F
        // distributes over the shared coarse pattern (+i term); other
        // weak entries fold into weak_sum (NoNeighbors excluded)
        double weak_sum = diag[i];
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 col = a_indices[j];
            if (col == i) continue;
            i64 p = ps[col];
            if ((p >> 32) == tag) {
                out_vals[row_start + (uint32_t)p] += a_data[j];
            } else if (flags[j] & 1) {
                if (!(flags[j] & 16)) continue;   // strong non-F
                i8 negbit = nb[col];
                double cs = 0.0;
                for (i64 k = a_indptr[col]; k < a_indptr[col + 1]; k++) {
                    if (!(flags[k] & negbit)) continue;
                    i64 ck = a_indices[k];
                    if (ck == col) continue;
                    if ((ps[ck] >> 32) == tag || ck == i)
                        cs += a_data[k];
                }
                if (cs < ZERO_TOL && cs > -ZERO_TOL) {
                    weak_sum += a_data[j];
                } else {
                    double ratio = a_data[j] / cs;
                    for (i64 k = a_indptr[col]; k < a_indptr[col + 1];
                         k++) {
                        if (!(flags[k] & negbit)) continue;
                        i64 ck = a_indices[k];
                        if (ck == col) continue;
                        if (ck == i) {
                            weak_sum += ratio * a_data[k];
                        } else {
                            i64 pk = ps[ck];
                            if ((pk >> 32) == tag)
                                out_vals[row_start + (uint32_t)pk]
                                    += ratio * a_data[k];
                        }
                    }
                }
            } else {
                if ((num_variables == 1
                     || variables[i] == variables[col])
                    && states[col] != -2 /* NoNeighbors */)
                    weak_sum += a_data[j];
            }
        }
        if (weak_sum > ZERO_TOL || weak_sum < -ZERO_TOL)
            for (i64 t = row_start; t < row_end; t++)
                out_vals[t] /= -weak_sum;
    }
    return nnz;
}

// glibc rand() TYPE_3 additive generator, bit-exact
// (see raptor_tpu/utils/glibc_rand.py; reference seeds srand(2448422+row),
// multilevel/par_multilevel.hpp:209-219). Writes n doubles rand()/RAND_MAX.
void glibc_rand_doubles(i64 seed, i64 n, double* out) {
    uint32_t r[34];
    seed &= 0xFFFFFFFFu;
    if (seed == 0) seed = 1;
    int32_t word = (int32_t)seed;
    r[0] = (uint32_t)word;
    for (int i = 1; i < 31; i++) {
        // Schrage's method on signed int32, matching glibc exactly
        int32_t hi = word / 127773;
        int32_t lo = word % 127773;
        word = 16807 * lo - 2836 * hi;
        if (word < 0) word += 2147483647;
        r[i] = (uint32_t)word;
    }
    for (int i = 31; i < 34; i++) r[i] = r[i - 31];
    // sliding window: value k appended = window[-31] + window[-3]
    std::vector<uint32_t> ring(34 + 310 + (size_t)n);
    std::memcpy(ring.data(), r, sizeof(r));
    for (i64 k = 0; k < 310 + n; k++) {
        uint32_t val = ring[3 + (size_t)k] + ring[31 + (size_t)k];
        ring[34 + (size_t)k] = val;
        if (k >= 310) out[k - 310] = (double)(val >> 1) / 2147483647.0;
    }
}

// Gustavson SpGEMM with dense accumulator (util/linalg/matmult.cpp:90-157
// semantics): per output row, accumulate a_ik * b_kj in k-ascending order
// (bitwise-identical to the scipy path previously used), emit columns
// sorted ascending, dropping |c_ij| <= zero_tol.
//
// Two-call protocol (output nnz is data-dependent): spgemm_compute fills
// internal buffers and c_indptr, returns nnz; spgemm_fetch copies out.
namespace {
thread_local std::vector<i64> g_c_indices;
thread_local std::vector<double> g_c_data;
thread_local i64 g_c_count = 0;

// Grow the output buffers so at least ``need`` more entries fit past
// ``out``. Geometric growth; buffers persist (capacity kept) across the
// per-level calls of the Galerkin chain.
inline void grow_out(i64 out, i64 need) {
    size_t want = (size_t)(out + need);
    if (g_c_indices.size() < want) {
        size_t ns = g_c_indices.size() * 2;
        if (ns < want) ns = want;
        if (ns < 4096) ns = 4096;
        g_c_indices.resize(ns);
        g_c_data.resize(ns);
    }
}
}

i64 spgemm_compute(i64 n_rows, i64 n_cols_b,
                   const i64* a_indptr, const i64* a_indices,
                   const double* a_data,
                   const i64* b_indptr, const i64* b_indices,
                   const double* b_data,
                   double zero_tol, i64* c_indptr) {
    std::vector<double> sums(n_cols_b, 0.0);
    std::vector<i64> stamp(n_cols_b, -1);
    std::vector<i64> touched(256);
    c_indptr[0] = 0;
    i64 out = 0;
    for (i64 i = 0; i < n_rows; i++) {
        i64 nt = 0;
        bool sorted = true;
        i64 last = -1;
        for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
            i64 k = a_indices[j];
            double av = a_data[j];
            for (i64 t = b_indptr[k]; t < b_indptr[k + 1]; t++) {
                i64 c = b_indices[t];
                double prod = av * b_data[t];
                if (stamp[c] != i) {
                    stamp[c] = i;
                    // first touch assigns (0.0 + x == x up to zero sign,
                    // and signed zeros are dropped by zero_tol anyway)
                    sums[c] = prod;
                    if (nt >= (i64)touched.size())
                        touched.resize(touched.size() * 2);
                    touched[nt++] = c;
                    if (c < last) sorted = false;
                    last = c;
                } else {
                    sums[c] += prod;
                }
            }
        }
        if (!sorted) std::sort(touched.data(), touched.data() + nt);
        grow_out(out, nt);
        i64* ip = g_c_indices.data() + out;
        double* vp = g_c_data.data() + out;
        i64 k = 0;
        for (i64 t = 0; t < nt; t++) {
            i64 c = touched[t];
            double v = sums[c];
            ip[k] = c;
            vp[k] = v;
            k += (v > zero_tol || v < -zero_tol) ? 1 : 0;
        }
        out += k;
        c_indptr[i + 1] = out;
    }
    g_c_count = out;
    return out;
}

// Greedy graph coloring in row order (smallest available color), over a
// symmetrized CSR pattern. Matches raptor_tpu/device/relax.py
// _greedy_coloring: only already-colored neighbors constrain the choice.
// Returns the number of colors.
i64 greedy_coloring(i64 n, const i64* indptr, const i64* indices,
                    i64* colors) {
    std::vector<i64> mark(n, -1);
    i64 n_colors = 0;
    for (i64 i = 0; i < n; i++) {
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = colors[indices[j]];
            if (c >= 0) mark[c] = i;
        }
        i64 c = 0;
        while (mark[c] == i) c++;
        colors[i] = c;
        if (c + 1 > n_colors) n_colors = c + 1;
    }
    return n_colors;
}

// Dependency levels of a triangular solve (relax.py _level_schedule):
// level[i] = 1 + max(level of cols in row i), 0 for empty rows. Forward
// walks rows ascending (lower tri), reverse descending (upper tri).
void level_schedule(i64 n, const i64* indptr, const i64* indices,
                    i64 reverse, i64* level) {
    if (!reverse) {
        for (i64 i = 0; i < n; i++) {
            i64 m = -1;
            for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
                i64 l = level[indices[j]];
                if (l > m) m = l;
            }
            level[i] = indptr[i + 1] > indptr[i] ? m + 1 : 0;
        }
    } else {
        for (i64 i = n - 1; i >= 0; i--) {
            i64 m = -1;
            for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
                i64 l = level[indices[j]];
                if (l > m) m = l;
            }
            level[i] = indptr[i + 1] > indptr[i] ? m + 1 : 0;
        }
    }
}

// Classical strength-of-connection keep mask in ONE pass over the CSR
// (strength.cpp:12-200 semantics, matching the vectorized NumPy oracle
// in ruge_stuben/strength.py bit-for-bit: same comparisons, same
// min/max row scaling, diagonal always kept). ``variables`` may be null
// (single-unknown). Writes 0/1 into keep[nnz].
// Fused classical strength: threshold + compress to the S CSR in ONE
// pass (the mask + NumPy filter_entries route costs a cumsum and two
// nnz-sized fancy gathers — ~2 s at 2048^2). Same keep rule as
// classical_strength_mask below (the oracle). out arrays sized nnz;
// returns S nnz.
i64 classical_strength_csr(i64 n, const i64* indptr, const i64* indices,
                           const double* data, double theta,
                           const i64* variables, i64 num_variables,
                           i64* out_indptr, i64* out_indices,
                           double* out_data) {
    i64 m = 0;
    out_indptr[0] = 0;
    for (i64 i = 0; i < n; i++) {
        double diag = 0.0;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (indices[j] == i) { diag = data[j]; break; }
        bool neg = diag < 0.0;
        double mn = INFINITY, mx = -INFINITY;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            if (c == i) continue;
            if (num_variables != 1 && variables[c] != variables[i])
                continue;
            double v = data[j];
            if (v < mn) mn = v;
            if (v > mx) mx = v;
        }
        double thr = (neg ? mx : mn) * theta;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            bool keep;
            if (c == i) keep = true;
            else if (num_variables != 1 && variables[c] != variables[i])
                keep = false;
            else keep = neg ? (data[j] > thr) : (data[j] < thr);
            if (keep) {
                out_indices[m] = c;
                out_data[m] = data[j];
                m++;
            }
        }
        out_indptr[i + 1] = m;
    }
    return m;
}

void classical_strength_mask(i64 n, const i64* indptr, const i64* indices,
                             const double* data, double theta,
                             const i64* variables, i64 num_variables,
                             i8* keep) {
    for (i64 i = 0; i < n; i++) {
        double diag = 0.0;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (indices[j] == i) { diag = data[j]; break; }
        bool neg = diag < 0.0;
        double mn = INFINITY, mx = -INFINITY;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            if (c == i) continue;
            if (num_variables != 1 && variables[c] != variables[i])
                continue;
            double v = data[j];
            if (v < mn) mn = v;
            if (v > mx) mx = v;
        }
        double thr = (neg ? mx : mn) * theta;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            if (c == i) { keep[j] = 1; continue; }
            if (num_variables != 1 && variables[c] != variables[i]) {
                keep[j] = 0;
                continue;
            }
            double v = data[j];
            keep[j] = neg ? (v > thr) : (v < thr);
        }
    }
}

// Symmetric (SA) strength keep mask (strength.cpp:201-327): an
// off-diagonal survives if it passes its row's OR its column's
// threshold. Two passes: thresholds, then the mask.
void symmetric_strength_mask(i64 n, const i64* indptr, const i64* indices,
                             const double* data, double theta,
                             i8* keep) {
    std::vector<double> thr(n);
    std::vector<char> neg(n);
    for (i64 i = 0; i < n; i++) {
        double diag = 0.0;
        double mn = INFINITY, mx = -INFINITY;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            double v = data[j];
            if (c == i) { diag = v; continue; }
            if (v < mn) mn = v;
            if (v > mx) mx = v;
        }
        neg[i] = diag < 0.0;
        thr[i] = (neg[i] ? mx : mn) * theta;
    }
    for (i64 i = 0; i < n; i++) {
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            if (c == i) { keep[j] = 1; continue; }
            double v = data[j];
            bool srow = neg[i] ? (v > thr[i]) : (v < thr[i]);
            bool scol = neg[c] ? (v > thr[c]) : (v < thr[c]);
            keep[j] = srow || scol;
        }
    }
}

// Fused symmetric strength: threshold + compress to S in one pass
// (same keep rule as symmetric_strength_mask above, the oracle).
// out arrays sized nnz; returns S nnz.
i64 symmetric_strength_csr(i64 n, const i64* indptr, const i64* indices,
                           const double* data, double theta,
                           i64* out_indptr, i64* out_indices,
                           double* out_data) {
    std::vector<double> thr(n);
    std::vector<char> neg(n);
    for (i64 i = 0; i < n; i++) {
        double diag = 0.0;
        double mn = INFINITY, mx = -INFINITY;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            double v = data[j];
            if (c == i) { diag = v; continue; }
            if (v < mn) mn = v;
            if (v > mx) mx = v;
        }
        neg[i] = diag < 0.0;
        thr[i] = (neg[i] ? mx : mn) * theta;
    }
    i64 m = 0;
    out_indptr[0] = 0;
    for (i64 i = 0; i < n; i++) {
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 c = indices[j];
            double v = data[j];
            bool k;
            if (c == i) k = true;
            else {
                bool srow = neg[i] ? (v > thr[i]) : (v < thr[i]);
                bool scol = neg[c] ? (v > thr[c]) : (v < thr[c]);
                k = srow || scol;
            }
            if (k) { out_indices[m] = c; out_data[m] = v; m++; }
        }
        out_indptr[i + 1] = m;
    }
    return m;
}

namespace {
// binary search for v in sorted a[0..len)
inline bool bfind(const i64* a, i64 len, i64 v) {
    i64 lo = 0, hi = len;
    while (lo < hi) {
        i64 mid = (lo + hi) / 2;
        if (a[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo < len && a[lo] == v;
}
// binary search for v in cmap[idx[0..len)] (idx ascending, cmap sorted)
inline bool bfind_map(const i64* idx, i64 len, const i64* cmap, i64 v) {
    i64 lo = 0, hi = len;
    while (lo < hi) {
        i64 mid = (lo + hi) / 2;
        if (cmap[idx[mid]] < v) lo = mid + 1; else hi = mid;
    }
    return lo < len && cmap[idx[lo]] == v;
}
}  // namespace

// One round of distributed-CLJP weight updates
// (par_cf_splitting.cpp:590-708 update_local/off_proc_dist2_weights):
// (1) unmark edges out of local new-C rows, (2) distance-2 unmarks for
// edge pairs that share a new C, local or remote (remote C rows via the
// prefetched halo patterns hp_*, remote decrements accumulated in
// off_dec). Exact transliteration of the Python oracle in
// ruge_stuben/par_setup.py dist_split_cljp — the candidate scan order
// (on-neighbors then off-neighbors) decides WHICH shared-C edge gets
// unmarked, so order is part of the contract.
void dist_cljp_update(
    i64 n, i64 h, i64 first_local_col,
    const i64* on_indptr, const i64* on_indices,
    const i64* off_indptr, const i64* off_indices,
    const i64* hp_indptr, const i64* hp_cols,
    const i64* cmap,
    const i64* st, const i64* hstU, const i64* sel, const i64* hnew,
    i64* edgemark_on, i64* edgemark_off,
    double* w, double* off_dec) {
    // (1) edges out of a local new C along its row
    for (i64 c = 0; c < n; c++) {
        if (!sel[c]) continue;
        for (i64 j = on_indptr[c]; j < on_indptr[c + 1]; j++) {
            i64 k = on_indices[j];
            if (st[k] == UNASSIGNED && edgemark_on[j]) {
                edgemark_on[j] = 0;
                w[k] -= 1.0;
            }
        }
        for (i64 j = off_indptr[c]; j < off_indptr[c + 1]; j++) {
            i64 k = off_indices[j];
            if (hstU[k] && edgemark_off[j]) {
                edgemark_off[j] = 0;
                off_dec[k] -= 1.0;
            }
        }
    }
    // (2) distance-2: edges (idx -> k) where k also points at a new C
    // that idx points at
    for (i64 idx = 0; idx < n; idx++) {
        if (st[idx] == SELECTED) continue;
        i64 o0 = on_indptr[idx], o1 = on_indptr[idx + 1];
        i64 f0 = off_indptr[idx], f1 = off_indptr[idx + 1];
        for (i64 cj = 0; cj < (o1 - o0) + (f1 - f0); cj++) {
            bool loc_on = cj < (o1 - o0);
            i64 c = loc_on ? on_indices[o0 + cj]
                           : off_indices[f0 + (cj - (o1 - o0))];
            if (loc_on ? !sel[c] : !hnew[c]) continue;
            i64 c_glob = loc_on ? c + first_local_col : cmap[c];
            for (i64 j = o0; j < o1; j++) {
                i64 k = on_indices[j];
                if (st[k] != UNASSIGNED || !edgemark_on[j]) continue;
                bool hit = loc_on &&
                    bfind(on_indices + on_indptr[k],
                          on_indptr[k + 1] - on_indptr[k], c);
                if (!hit)
                    hit = bfind_map(off_indices + off_indptr[k],
                                    off_indptr[k + 1] - off_indptr[k],
                                    cmap, c_glob);
                if (hit) {
                    edgemark_on[j] = 0;
                    w[k] -= 1.0;
                }
            }
            for (i64 j = f0; j < f1; j++) {
                i64 k = off_indices[j];
                if (!hstU[k] || !edgemark_off[j]) continue;
                if (bfind(hp_cols + hp_indptr[k],
                          hp_indptr[k + 1] - hp_indptr[k], c_glob)) {
                    edgemark_off[j] = 0;
                    off_dec[k] -= 1.0;
                }
            }
        }
    }
}

// Distributed MIS(2) round steps (aggregation/par_mis.cpp:216-655),
// transliterating ruge_stuben/par_setup.py dist_mis2. States use the
// CFState encoding. Fringe arrays (fr sorted global ids + their
// states/rand) stand in for the reference's comm_coarse_dist1 data.
void dist_mis2_step1(
    i64 n,
    const i64* on_indptr, const i64* on_indices,
    const i64* off_indptr, const i64* off_indices,
    const double* rr, const double* halo_r,
    const i64* hst, i64* st) {
    for (i64 v = 0; v < n; v++) {
        if (st[v] != UNASSIGNED) continue;
        bool blocked = false;
        for (i64 j = on_indptr[v]; j < on_indptr[v + 1] && !blocked;
             j++) {
            i64 d = on_indices[j];
            if (d == v || rr[v] <= rr[d]) continue;
            if (st[d] == UNASSIGNED || st[d] > SELECTED) blocked = true;
        }
        for (i64 j = off_indptr[v]; j < off_indptr[v + 1] && !blocked;
             j++) {
            i64 d = off_indices[j];
            if (rr[v] <= halo_r[d]) continue;
            if (hst[d] == UNASSIGNED || hst[d] > SELECTED) blocked = true;
        }
        if (!blocked) st[v] = TMP_SELECTION;
    }
}

void dist_mis2_step2(
    i64 n, i64 h,
    const i64* on_indptr, const i64* on_indices,
    const i64* off_indptr, const i64* off_indices,
    const i64* hp_indptr, const i64* hp_cols,
    const double* rr, const double* halo_r,
    const i64* hst,
    const i64* fr, i64 n_fr, const i64* fst, const double* frr,
    i64* st) {
    for (i64 v = 0; v < n; v++) {
        if (st[v] != TMP_SELECTION) continue;
        bool revert = false;
        for (i64 j = on_indptr[v]; j < on_indptr[v + 1] && !revert;
             j++) {
            i64 wn = on_indices[j];
            for (i64 t = on_indptr[wn]; t < on_indptr[wn + 1]; t++) {
                i64 u = on_indices[t];
                if (st[u] > SELECTED && rr[u] > rr[v]) {
                    revert = true;
                    break;
                }
            }
            if (revert) break;
            for (i64 t = off_indptr[wn]; t < off_indptr[wn + 1]; t++) {
                i64 u = off_indices[t];
                if (hst[u] > SELECTED && halo_r[u] > rr[v]) {
                    revert = true;
                    break;
                }
            }
        }
        if (!revert) {
            for (i64 j = off_indptr[v]; j < off_indptr[v + 1] && !revert;
                 j++) {
                i64 wn = off_indices[j];
                for (i64 t = hp_indptr[wn]; t < hp_indptr[wn + 1]; t++) {
                    i64 gu = hp_cols[t];
                    // lookup gu in fringe table
                    i64 lo = 0, hi = n_fr;
                    while (lo < hi) {
                        i64 mid = (lo + hi) / 2;
                        if (fr[mid] < gu) lo = mid + 1; else hi = mid;
                    }
                    if (lo < n_fr && fr[lo] == gu) {
                        if (fst[lo] > SELECTED && frr[lo] > rr[v]) {
                            revert = true;
                            break;
                        }
                    }
                }
            }
        }
        if (!revert) st[v] = NEW_SELECTION;
    }
}

void dist_mis2_steps34(
    i64 n, i64 h,
    const i64* on_indptr, const i64* on_indices,
    const i64* off_indptr, const i64* off_indices,
    const i64* hp_indptr, const i64* hp_cols,
    const i64* hst,
    const i64* fr, i64 n_fr, const i64* fst,
    i64* st) {
    // C flag for local nodes: points at any NEW_SELECTION
    std::vector<char> C(n, 0), Ch(h, 0);
    for (i64 wn = 0; wn < n; wn++) {
        bool c = false;
        for (i64 j = on_indptr[wn]; j < on_indptr[wn + 1]; j++)
            if (st[on_indices[j]] == NEW_SELECTION) { c = true; break; }
        if (!c)
            for (i64 j = off_indptr[wn]; j < off_indptr[wn + 1]; j++)
                if (hst[off_indices[j]] == NEW_SELECTION) {
                    c = true;
                    break;
                }
        C[wn] = c;
    }
    for (i64 wn = 0; wn < h; wn++) {
        for (i64 t = hp_indptr[wn]; t < hp_indptr[wn + 1]; t++) {
            i64 gu = hp_cols[t];
            i64 lo = 0, hi2 = n_fr;
            while (lo < hi2) {
                i64 mid = (lo + hi2) / 2;
                if (fr[mid] < gu) lo = mid + 1; else hi2 = mid;
            }
            if (lo < n_fr && fr[lo] == gu
                && fst[lo] == NEW_SELECTION) {
                Ch[wn] = 1;
                break;
            }
        }
    }
    for (i64 v = 0; v < n; v++) {
        if (st[v] != UNASSIGNED && st[v] != TMP_SELECTION) continue;
        bool unsel = false;
        for (i64 j = on_indptr[v]; j < on_indptr[v + 1]; j++) {
            i64 nb = on_indices[j];
            if (st[nb] == NEW_SELECTION || C[nb]) { unsel = true; break; }
        }
        if (!unsel)
            for (i64 j = off_indptr[v]; j < off_indptr[v + 1]; j++) {
                i64 ob = off_indices[j];
                if (hst[ob] == NEW_SELECTION || Ch[ob]) {
                    unsel = true;
                    break;
                }
            }
        if (unsel) st[v] = NEW_UNSELECTION;
    }
}

// Distributed aggregation passes (aggregation/par_aggregate.cpp:7-187),
// transliterating par_setup.py dist_aggregate. Pass 1: first root
// neighbor in GLOBAL column order; pass 2: strongest assigned neighbor
// (|a_ij| + rand[col]), non-cascading (encoded negative).
void dist_aggregate_pass1(
    i64 n, i64 first_local_col,
    const i64* s_on_indptr, const i64* s_on_indices,
    const i64* s_off_indptr, const i64* s_off_indices,
    const i64* cmap,
    const i64* st, const i64* hst,
    const i64* hagg, i64* agg) {
    for (i64 i = 0; i < n; i++) {
        if (st[i] > 0) continue;
        // merge on (globals = local + c0) and off (cmap) by global id
        i64 j = s_on_indptr[i], jend = s_on_indptr[i + 1];
        i64 k = s_off_indptr[i], kend = s_off_indptr[i + 1];
        while (j < jend || k < kend) {
            i64 gon = j < jend ? s_on_indices[j] + first_local_col
                               : INT64_MAX;
            i64 gof = k < kend ? cmap[s_off_indices[k]] : INT64_MAX;
            if (gon <= gof) {
                i64 c = s_on_indices[j];
                if (st[c] > 0) { agg[i] = agg[c]; break; }
                j++;
            } else {
                i64 c = s_off_indices[k];
                if (hst[c] > 0) { agg[i] = hagg[c]; break; }
                k++;
            }
        }
    }
}

void dist_aggregate_pass2(
    i64 n,
    const i64* s_on_indptr, const i64* s_on_indices,
    const i64* s_off_indptr, const i64* s_off_indices,
    const i64* a_on_indptr, const i64* a_on_indices,
    const double* a_on_data,
    const i64* a_off_indptr, const i64* a_off_indices,
    const double* a_off_data,
    const i64* amap, const i64* smap,
    const double* r_loc, const double* halo_r,
    const i64* hagg, i64* agg) {
    for (i64 i = 0; i < n; i++) {
        if (agg[i] >= 0) continue;
        double best_val = 0.0;
        i64 best_agg = -1;
        for (i64 j = s_on_indptr[i]; j < s_on_indptr[i + 1]; j++) {
            i64 c = s_on_indices[j];
            // p = position of c in A's on row i (present by S subset of A)
            i64 lo = a_on_indptr[i], hi = a_on_indptr[i + 1];
            while (lo < hi) {
                i64 mid = (lo + hi) / 2;
                if (a_on_indices[mid] < c) lo = mid + 1; else hi = mid;
            }
            double val = std::abs(a_on_data[lo]) + r_loc[c];
            if (val > best_val && agg[c] >= 0) {
                best_val = val;
                best_agg = agg[c];
            }
        }
        for (i64 j = s_off_indptr[i]; j < s_off_indptr[i + 1]; j++) {
            i64 k = s_off_indices[j];
            i64 g = smap[k];
            i64 lo = a_off_indptr[i], hi = a_off_indptr[i + 1];
            while (lo < hi) {
                i64 mid = (lo + hi) / 2;
                if (amap[a_off_indices[mid]] < g) lo = mid + 1;
                else hi = mid;
            }
            double val = std::abs(a_off_data[lo]) + halo_r[k];
            if (val > best_val && hagg[k] >= 0) {
                best_val = val;
                best_agg = hagg[k];
            }
        }
        agg[i] = -(best_agg + 1);  // non-cascading encode
    }
}

// C = A^T B without materializing A^T on the Python side (the
// reference's transpose-SpGEMM, util/linalg/matmult.cpp:158-226 /
// par_matmult.cpp:364-441, used for Ac = P^T (A P)). Builds CSC(A) by
// counting sort, then runs the same Gustavson accumulator per output
// row c over A's column-c entries in ascending fine-row order — the
// identical FLOP sequence to spgemm_compute(CSR(A^T), B), so results
// are bitwise equal to the transpose-then-multiply path.
i64 spgemm_t_compute(i64 n_rows_a, i64 n_cols_a, i64 n_cols_b,
                     const i64* a_indptr, const i64* a_indices,
                     const double* a_data,
                     const i64* b_indptr, const i64* b_indices,
                     const double* b_data,
                     double zero_tol, i64* c_indptr) {
    g_c_indices.clear();
    g_c_data.clear();
    i64 nnz_a = a_indptr[n_rows_a];
    // CSC of A: col_ptr / rows / vals (rows ascending per column since
    // the pass below walks rows in order)
    std::vector<i64> col_ptr(n_cols_a + 1, 0);
    for (i64 j = 0; j < nnz_a; j++) col_ptr[a_indices[j] + 1]++;
    for (i64 c = 0; c < n_cols_a; c++) col_ptr[c + 1] += col_ptr[c];
    std::vector<i64> csc_rows(nnz_a);
    std::vector<double> csc_vals(nnz_a);
    {
        std::vector<i64> fill(col_ptr.begin(), col_ptr.end() - 1);
        for (i64 i = 0; i < n_rows_a; i++) {
            for (i64 j = a_indptr[i]; j < a_indptr[i + 1]; j++) {
                i64 c = a_indices[j];
                csc_rows[fill[c]] = i;
                csc_vals[fill[c]] = a_data[j];
                fill[c]++;
            }
        }
    }
    std::vector<double> sums(n_cols_b, 0.0);
    std::vector<i64> stamp(n_cols_b, -1);
    std::vector<i64> touched(256);
    c_indptr[0] = 0;
    i64 out = 0;
    for (i64 c = 0; c < n_cols_a; c++) {
        i64 nt = 0;
        bool sorted = true;
        i64 last = -1;
        for (i64 j = col_ptr[c]; j < col_ptr[c + 1]; j++) {
            i64 i = csc_rows[j];
            double av = csc_vals[j];
            for (i64 t = b_indptr[i]; t < b_indptr[i + 1]; t++) {
                i64 k = b_indices[t];
                double prod = av * b_data[t];
                if (stamp[k] != c) {
                    stamp[k] = c;
                    sums[k] = prod;
                    if (nt >= (i64)touched.size())
                        touched.resize(touched.size() * 2);
                    touched[nt++] = k;
                    if (k < last) sorted = false;
                    last = k;
                } else {
                    sums[k] += prod;
                }
            }
        }
        if (!sorted) std::sort(touched.data(), touched.data() + nt);
        grow_out(out, nt);
        i64* ip = g_c_indices.data() + out;
        double* vp = g_c_data.data() + out;
        i64 k = 0;
        for (i64 t = 0; t < nt; t++) {
            i64 cc = touched[t];
            double v = sums[cc];
            ip[k] = cc;
            vp[k] = v;
            k += (v > zero_tol || v < -zero_tol) ? 1 : 0;
        }
        out += k;
        c_indptr[c + 1] = out;
    }
    g_c_count = out;
    return out;
}

void spgemm_fetch(i64* c_indices, double* c_data) {
    // buffers persist (capacity kept) across the Galerkin chain's
    // per-level calls: re-growing a few-hundred-MB buffer from zero
    // costs seconds of page faults each time
    std::memcpy(c_indices, g_c_indices.data(), g_c_count * sizeof(i64));
    std::memcpy(c_data, g_c_data.data(), g_c_count * sizeof(double));
}

// Direct CSR assembly of a constant-stencil grid operator
// (gallery/stencil.cpp:8-196): K column-offset diagonals with dcols
// ascending; entry k is valid at a row iff every grid coordinate admits
// its per-dimension offset. The boundary test is one AND of the entry's
// precomputed needs-bits against a per-row violation bitmask (2 bits per
// dimension, updated by the row odometer), so the hot loop is branch-light.
// Emits CSR directly -- indices ascend within each row because dcols do.
// Returns nnz. (NumPy fancy-gather formulation of the same fast path runs
// at ~20 Melem/s on this host; this loop replaces it entirely.)
i64 stencil_csr(i64 dim, const i64* grid, i64 K,
                const i64* dcols, const double* dvals, const i64* offs,
                i64* indptr, i64* indices, double* data)
{
    i64 n_v = 1;
    for (i64 d = 0; d < dim; d++) n_v *= grid[d];
    std::vector<uint32_t> needs(K, 0);
    for (i64 k = 0; k < K; k++)
        for (i64 d = 0; d < dim; d++) {
            i64 o = offs[k * dim + d];
            if (o == -1) needs[k] |= 1u << (2 * d);
            else if (o == 1) needs[k] |= 1u << (2 * d + 1);
        }
    std::vector<i64> coord(dim, 0);
    uint32_t viol = 0;
    for (i64 d = 0; d < dim; d++) {
        viol |= 1u << (2 * d);                      // coord 0 violates -1
        if (grid[d] == 1) viol |= 2u << (2 * d);    // ...and +1
    }
    i64 nnz = 0;
    indptr[0] = 0;
    for (i64 r = 0; r < n_v; r++) {
        for (i64 k = 0; k < K; k++) {
            if ((needs[k] & viol) == 0) {
                indices[nnz] = r + dcols[k];
                data[nnz] = dvals[k];
                nnz++;
            }
        }
        indptr[r + 1] = nnz;
        for (i64 d = dim - 1; d >= 0; d--) {   // odometer, last dim fastest
            i64 c = ++coord[d];
            uint32_t lo = 1u << (2 * d), hi = 2u << (2 * d);
            if (c < grid[d]) {
                viol &= ~lo;
                if (c == grid[d] - 1) viol |= hi;
                break;
            }
            coord[d] = 0;
            viol |= lo;
            if (grid[d] == 1) viol |= hi; else viol &= ~hi;
        }
    }
    return nnz;
}

// Size bound for the distance-2 interpolation pattern (extended+i):
// identity rows + per-row strong entries + per strong-F entry the strong
// count of its row. Replaces the NumPy cumsum + two 56M-element fancy
// gathers that used to compute this bound on the Python side.
i64 interp_pattern_bound(i64 n, const i64* indptr, const i64* indices,
                         const i8* strong, const i64* states) {
    std::vector<i64> s_cnt(n);
    i64 total = 0;
    for (i64 i = 0; i < n; i++) {
        i64 c = 0;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) c += strong[j];
        s_cnt[i] = c;
        total += c;
    }
    i64 b = n + total + 1;
    for (i64 i = 0; i < n; i++)
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (strong[j] && states[indices[j]] == UNSELECTED)
                b += s_cnt[indices[j]];
    return b;
}

// --- device-interp operand packing (device/interp.py::_prep) ----------------
// One classification pass over the FULL sorted CSR (diagonal included,
// unlike the diag-stripped splitting kernels above) producing every
// slot-major [W, n] ELL operand of the device extended+i pipeline.
// Replaces ~15 vectorized NumPy passes over A's entries (42 s at 128^3
// on this host; this pass is ~1 s).

namespace {
constexpr int32_t ELL_SENT = 2147483647;  // device/spgemm.py SENT
}

// widths pass: per-row max counts of each entry class over F rows, plus
// the exact pattern bound max(|SC_i| + sum_{k in strong-F(i)} |SC_k|).
// out = {W_SC, W_SF, W_BCS, W_BCW, W_AWC, p_bound}
void interp_dev_widths(i64 n, const i64* indptr, const i64* indices,
                       const double* data, const i8* strong,
                       const i64* states, i64* out)
{
    std::vector<i64> sc_cnt(n, 0);
    i64 w[5] = {1, 1, 1, 1, 1};
    std::vector<double> diag(n, 0.0);
    for (i64 i = 0; i < n; i++)
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (indices[j] == i) { diag[i] = data[j]; break; }
    for (i64 i = 0; i < n; i++) {
        if (states[i] != UNSELECTED) continue;
        double sgn = diag[i] < 0 ? -1.0 : 1.0;
        i64 c[5] = {0, 0, 0, 0, 0};
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 col = indices[j];
            i64 st = states[col];
            bool sb = strong[j] != 0;
            bool cst = st == SELECTED;
            if (sb && cst) { c[0]++; sc_cnt[i]++; }
            if (sb && st == UNSELECTED) c[1]++;
            bool sok = data[j] * sgn < 0;
            if (sok && cst && sb) c[2]++;
            if (sok && cst && !sb) c[3]++;
            if (!sb && cst && col != i) c[4]++;
        }
        for (int k = 0; k < 5; k++) if (c[k] > w[k]) w[k] = c[k];
    }
    i64 pb = 1;
    for (i64 i = 0; i < n; i++) {
        if (states[i] != UNSELECTED) continue;
        i64 b = sc_cnt[i];
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (strong[j] && states[indices[j]] == UNSELECTED)
                b += sc_cnt[indices[j]];
        if (b > pb) pb = b;
    }
    for (int k = 0; k < 5; k++) out[k] = w[k];
    out[5] = pb;
}

// pack pass: fills the slot-major ELLs (cols pre-set to ELL_SENT and
// vals to 0 by this function), dsc row sums, wsum0 bases, and the
// transpose samples a_ki (di = sign-filtered, at = raw) aligned with
// the SF slots.
void interp_dev_pack(i64 n, const i64* indptr, const i64* indices,
                     const double* data, const i8* strong,
                     const i64* states,
                     i64 w_sc, int32_t* sc_c, double* sc_v,
                     i64 w_sf, int32_t* sf_c, double* sf_v,
                     double* di_v, double* at_v,
                     i64 w_bcs, int32_t* bcs_c, double* bcs_v,
                     i64 w_bcw, int32_t* bcw_c, double* bcw_v,
                     i64 w_awc, int32_t* awc_c, double* awc_v,
                     double* dsc, double* wsum0)
{
    std::fill(sc_c, sc_c + w_sc * n, ELL_SENT);
    std::fill(sf_c, sf_c + w_sf * n, ELL_SENT);
    std::fill(bcs_c, bcs_c + w_bcs * n, ELL_SENT);
    std::fill(bcw_c, bcw_c + w_bcw * n, ELL_SENT);
    std::fill(awc_c, awc_c + w_awc * n, ELL_SENT);
    std::fill(sc_v, sc_v + w_sc * n, 0.0);
    std::fill(sf_v, sf_v + w_sf * n, 0.0);
    std::fill(di_v, di_v + w_sf * n, 0.0);
    std::fill(at_v, at_v + w_sf * n, 0.0);
    std::fill(bcs_v, bcs_v + w_bcs * n, 0.0);
    std::fill(bcw_v, bcw_v + w_bcw * n, 0.0);
    std::fill(awc_v, awc_v + w_awc * n, 0.0);
    std::vector<double> diag(n, 0.0);
    for (i64 i = 0; i < n; i++)
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (indices[j] == i) { diag[i] = data[j]; break; }
    for (i64 i = 0; i < n; i++) {
        dsc[i] = 0.0;
        wsum0[i] = diag[i];
        if (states[i] != UNSELECTED) continue;
        double sgn = diag[i] < 0 ? -1.0 : 1.0;
        i64 nsc = 0, nsf = 0, nbs = 0, nbw = 0, naw = 0;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 col = indices[j];
            double v = data[j];
            i64 st = states[col];
            bool sb = strong[j] != 0;
            bool cst = st == SELECTED;
            if (sb && cst) {
                sc_c[nsc * n + i] = (int32_t)col;
                sc_v[nsc * n + i] = v;
                nsc++;
            }
            if (sb && st == UNSELECTED) {
                sf_c[nsf * n + i] = (int32_t)col;
                sf_v[nsf * n + i] = v;
                // a_ki: binary search i in row col
                const i64* lo = indices + indptr[col];
                const i64* hi = indices + indptr[col + 1];
                const i64* it = std::lower_bound(lo, hi, i);
                if (it != hi && *it == i) {
                    double aki = data[indptr[col] + (it - lo)];
                    double sgnk = diag[col] < 0 ? -1.0 : 1.0;
                    at_v[nsf * n + i] = aki;
                    if (aki * sgnk < 0) di_v[nsf * n + i] = aki;
                }
                nsf++;
            }
            bool sok = v * sgn < 0;
            if (sok && cst) {
                if (sb) {
                    bcs_c[nbs * n + i] = (int32_t)col;
                    bcs_v[nbs * n + i] = v;
                    nbs++;
                    dsc[i] += v;
                } else {
                    bcw_c[nbw * n + i] = (int32_t)col;
                    bcw_v[nbw * n + i] = v;
                    nbw++;
                }
            }
            if (!sb && col != i) {
                // NoNeighbors columns never reach the weak sum
                // (par_interpolation.cpp:831-838)
                if (st != -2) wsum0[i] += v;
                if (cst) {
                    awc_c[naw * n + i] = (int32_t)col;
                    awc_v[naw * n + i] = v;
                    naw++;
                }
            }
        }
    }
}

// Diag-stripped row pattern + its CSC transpose in one pass — the
// splitting-pattern builder (cf_splitting.py::_pattern). Replaces a
// NumPy repeat+mask (1.5 s at 128^3) and a scipy tocsc (0.55 s).
// out_indices/col_indices must be allocated with nnz slots and
// col_ptr with n_cols + 1 (rectangular S is legal); the real length
// is out_indptr[n]. Returns the off-diagonal count.
i64 split_pattern(i64 n, i64 n_cols, const i64* indptr,
                  const i64* indices, i64* out_indptr, i64* out_indices,
                  i64* col_ptr, i64* col_indices)
{
    i64 m = 0;
    out_indptr[0] = 0;
    for (i64 i = 0; i < n; i++) {
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (indices[j] != i) out_indices[m++] = indices[j];
        out_indptr[i + 1] = m;
    }
    for (i64 c = 0; c <= n_cols; c++) col_ptr[c] = 0;
    for (i64 t = 0; t < m; t++) col_ptr[out_indices[t] + 1]++;
    for (i64 c = 0; c < n_cols; c++) col_ptr[c + 1] += col_ptr[c];
    std::vector<i64> cur(col_ptr, col_ptr + n_cols);
    for (i64 i = 0; i < n; i++)
        for (i64 j = out_indptr[i]; j < out_indptr[i + 1]; j++)
            col_indices[cur[out_indices[j]]++] = i;
    return m;
}

// mod-classical variant of the device-interp packing: pattern is
// strong-C only, the distribution source is ALL C-state off-diagonal
// entries (strong + weak, sign applied per TARGET row on device), and
// the weak base has no pattern correction.
// out widths = {W_SC, W_SF, W_BA}
void interp_dev_widths_mc(i64 n, const i64* indptr, const i64* indices,
                          const i8* strong, const i64* states, i64* out)
{
    i64 w[3] = {1, 1, 1};
    for (i64 i = 0; i < n; i++) {
        if (states[i] != UNSELECTED) continue;
        i64 c[3] = {0, 0, 0};
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 col = indices[j];
            i64 st = states[col];
            bool sb = strong[j] != 0;
            if (sb && st == SELECTED) c[0]++;
            if (sb && st == UNSELECTED) c[1]++;
            if (st == SELECTED && col != i) c[2]++;
        }
        for (int k = 0; k < 3; k++) if (c[k] > w[k]) w[k] = c[k];
    }
    for (int k = 0; k < 3; k++) out[k] = w[k];
}

void interp_dev_pack_mc(i64 n, const i64* indptr, const i64* indices,
                        const double* data, const i8* strong,
                        const i64* states,
                        const i64* variables, i64 num_variables,
                        i64 w_sc, int32_t* sc_c, double* sc_v,
                        i64 w_sf, int32_t* sf_c, double* sf_v,
                        i64 w_ba, int32_t* ba_c, double* ba_v,
                        double* wsum0, double* sgn)
{
    std::fill(sc_c, sc_c + w_sc * n, ELL_SENT);
    std::fill(sf_c, sf_c + w_sf * n, ELL_SENT);
    std::fill(ba_c, ba_c + w_ba * n, ELL_SENT);
    std::fill(sc_v, sc_v + w_sc * n, 0.0);
    std::fill(sf_v, sf_v + w_sf * n, 0.0);
    std::fill(ba_v, ba_v + w_ba * n, 0.0);
    for (i64 i = 0; i < n; i++) {
        double d = 0.0;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++)
            if (indices[j] == i) { d = data[j]; break; }
        sgn[i] = d < 0 ? -1.0 : 1.0;
        wsum0[i] = d;
        if (states[i] != UNSELECTED) continue;
        i64 nsc = 0, nsf = 0, nba = 0;
        for (i64 j = indptr[i]; j < indptr[i + 1]; j++) {
            i64 col = indices[j];
            double v = data[j];
            i64 st = states[col];
            bool sb = strong[j] != 0;
            if (sb && st == SELECTED) {
                sc_c[nsc * n + i] = (int32_t)col;
                sc_v[nsc * n + i] = v;
                nsc++;
            }
            if (sb && st == UNSELECTED) {
                sf_c[nsf * n + i] = (int32_t)col;
                sf_v[nsf * n + i] = v;
                nsf++;
            }
            if (st == SELECTED && col != i) {
                ba_c[nba * n + i] = (int32_t)col;
                ba_v[nba * n + i] = v;
                nba++;
            }
            if (!sb && col != i && st != -2 /* NoNeighbors, :1327 */ &&
                (num_variables == 1 || variables[i] == variables[col]))
                wsum0[i] += v;
        }
    }
}

// Post-pass for the interpolation kernels' triplet output: build indptr
// from the (non-decreasing) row ids, map columns through col_map
// (monotone over the coarse points, so in-row column ORDER is preserved
// by the mapping), and insertion-sort each row segment by column when the
// emitting kernel discovers its pattern out of order (extended_interp;
// mod_classical emits in A-row order, already ascending). Entries are
// unique per row (the kernels' stamp dedup), so this replaces the scipy
// coo->csr + sum_duplicates + sort_indices round trip.
void finalize_interp(i64 n, i64 nnz, const i64* rows, i64* cols,
                     double* vals, const i64* col_map, i64 do_sort,
                     i64* indptr)
{
    for (i64 i = 0; i <= n; i++) indptr[i] = 0;
    for (i64 t = 0; t < nnz; t++) indptr[rows[t] + 1]++;
    for (i64 i = 0; i < n; i++) indptr[i + 1] += indptr[i];
    for (i64 t = 0; t < nnz; t++) cols[t] = col_map[cols[t]];
    if (!do_sort) return;
    for (i64 i = 0; i < n; i++) {
        i64 s = indptr[i], e = indptr[i + 1];
        for (i64 a = s + 1; a < e; a++) {
            i64 c = cols[a];
            double v = vals[a];
            i64 b = a - 1;
            while (b >= s && cols[b] > c) {
                cols[b + 1] = cols[b];
                vals[b + 1] = vals[b];
                b--;
            }
            cols[b + 1] = c;
            vals[b + 1] = v;
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Multilevel k-way graph partitioning.
//
// The reference gets edge-cut-minimizing repartitioning from ParMETIS /
// PT-Scotch (util/linalg/external/parmetis_wrapper.hpp:12,
// ptscotch_wrapper.hpp:17). This is an original METIS-style multilevel
// k-way: heavy-edge-matching coarsening -> greedy region growing on the
// coarsest graph -> boundary FM refinement at every uncoarsening level.
// Deterministic (fixed LCG), no external dependency.
//
// Input: symmetric adjacency CSR with no self loops (caller symmetrizes);
// ew (edge weights) may be null (unit weights). Output: part[n] in [0,k).
// Returns the edge cut (sum of cut edge weights, each edge counted once).
// ---------------------------------------------------------------------------

namespace kway {

struct Graph {
    i64 n = 0;
    std::vector<i64> xadj, adj;
    std::vector<double> ew;   // edge weights
    std::vector<i64> vw;      // vertex weights (fine-vertex counts)
};

struct Lcg {
    uint64_t s;
    explicit Lcg(uint64_t seed) : s(seed) {}
    uint64_t next() { s = s * 6364136223846793005ull + 1442695040888963407ull; return s >> 17; }
    i64 below(i64 m) { return m > 0 ? (i64)(next() % (uint64_t)m) : 0; }
};

// Heavy-edge matching: visit vertices in a fixed shuffled order, match each
// unmatched vertex with its unmatched neighbor of maximum edge weight.
// cmap[v] = coarse id; returns n_coarse.
static i64 hem_match(const Graph& g, std::vector<i64>& cmap, Lcg& rng,
                     i64 max_vwt) {
    std::vector<i64> order(g.n);
    for (i64 i = 0; i < g.n; i++) order[i] = i;
    for (i64 i = g.n - 1; i > 0; i--) std::swap(order[i], order[rng.below(i + 1)]);
    cmap.assign(g.n, -1);
    i64 nc = 0;
    for (i64 oi = 0; oi < g.n; oi++) {
        i64 v = order[oi];
        if (cmap[v] >= 0) continue;
        i64 best = -1;
        double bw = -1.0;
        for (i64 e = g.xadj[v]; e < g.xadj[v + 1]; e++) {
            i64 u = g.adj[e];
            if (cmap[u] >= 0 || u == v) continue;
            // weight cap keeps hub-heavy (power-law) graphs matchable
            // into balanceable coarse vertices
            if (g.vw[v] + g.vw[u] > max_vwt) continue;
            double w = g.ew[e];
            // prefer heavier edges; among equals prefer lighter vertices
            // (keeps coarse vertex weights balanced)
            if (w > bw || (w == bw && best >= 0 && g.vw[u] < g.vw[best])) {
                bw = w; best = u;
            }
        }
        cmap[v] = nc;
        if (best >= 0) cmap[best] = nc;
        nc++;
    }
    return nc;
}

// Contract g by cmap into nc coarse vertices (Gustavson-style row merge
// with a dense marker).
static Graph contract(const Graph& g, const std::vector<i64>& cmap, i64 nc) {
    Graph c;
    c.n = nc;
    c.vw.assign(nc, 0);
    for (i64 v = 0; v < g.n; v++) c.vw[cmap[v]] += g.vw[v];
    // fine members per coarse vertex (counting sort)
    std::vector<i64> cnt(nc + 1, 0), members(g.n);
    for (i64 v = 0; v < g.n; v++) cnt[cmap[v] + 1]++;
    for (i64 i = 0; i < nc; i++) cnt[i + 1] += cnt[i];
    {
        std::vector<i64> pos(cnt.begin(), cnt.end() - 1);
        for (i64 v = 0; v < g.n; v++) members[pos[cmap[v]]++] = v;
    }
    std::vector<i64> marker(nc, -1);
    std::vector<i64> touched;
    std::vector<double> acc(nc, 0.0);
    c.xadj.reserve(nc + 1);
    c.xadj.push_back(0);
    for (i64 cv = 0; cv < nc; cv++) {
        touched.clear();
        for (i64 mi = cnt[cv]; mi < cnt[cv + 1]; mi++) {
            i64 v = members[mi];
            for (i64 e = g.xadj[v]; e < g.xadj[v + 1]; e++) {
                i64 cu = cmap[g.adj[e]];
                if (cu == cv) continue;          // interior edge vanishes
                if (marker[cu] < 0) { marker[cu] = 1; touched.push_back(cu); }
                acc[cu] += g.ew[e];
            }
        }
        std::sort(touched.begin(), touched.end());
        for (i64 cu : touched) {
            c.adj.push_back(cu);
            c.ew.push_back(acc[cu]);
            marker[cu] = -1;
            acc[cu] = 0.0;
        }
        c.xadj.push_back((i64)c.adj.size());
    }
    return c;
}

// Greedy graph growing on the coarsest graph: grow each part by BFS from a
// random seed until it reaches the weight target; leftovers go to the
// lightest adjacent (else lightest) part.
static void init_partition(const Graph& g, i64 k, std::vector<i64>& part,
                           Lcg& rng) {
    part.assign(g.n, -1);
    i64 total = 0;
    for (i64 v = 0; v < g.n; v++) total += g.vw[v];
    double target = (double)total / (double)k;
    std::vector<i64> queue;
    for (i64 p = 0; p < k - 1; p++) {
        // seed: random unassigned vertex
        i64 seed = -1;
        for (i64 tries = 0; tries < 8 && seed < 0; tries++) {
            i64 cand = rng.below(g.n);
            if (part[cand] < 0) seed = cand;
        }
        if (seed < 0)
            for (i64 v = 0; v < g.n; v++) if (part[v] < 0) { seed = v; break; }
        if (seed < 0) break;
        queue.clear();
        queue.push_back(seed);
        part[seed] = p;
        i64 w = g.vw[seed];
        for (size_t qi = 0; qi < queue.size() && w < target; qi++) {
            i64 v = queue[qi];
            for (i64 e = g.xadj[v]; e < g.xadj[v + 1] && w < target; e++) {
                i64 u = g.adj[e];
                if (part[u] >= 0) continue;
                part[u] = p;
                w += g.vw[u];
                queue.push_back(u);
            }
        }
    }
    for (i64 v = 0; v < g.n; v++) if (part[v] < 0) part[v] = k - 1;
}

// One boundary-refinement sweep: move boundary vertices to the neighbor
// part with the highest connectivity gain, subject to a balance cap.
// Returns number of moves.
static i64 refine_sweep(const Graph& g, i64 k, std::vector<i64>& part,
                        std::vector<i64>& pw, i64 maxw) {
    std::vector<double> conn(k, 0.0);
    std::vector<i64> touched;
    i64 moves = 0;
    for (i64 v = 0; v < g.n; v++) {
        i64 cur = part[v];
        bool over = pw[cur] > maxw;
        touched.clear();
        for (i64 e = g.xadj[v]; e < g.xadj[v + 1]; e++) {
            i64 p = part[g.adj[e]];
            if (conn[p] == 0.0) touched.push_back(p);
            conn[p] += g.ew[e];
        }
        i64 best = -1;
        double bestgain = -1e300;
        for (i64 p : touched) {
            if (p == cur) continue;
            if (pw[p] + g.vw[v] > maxw) continue;
            double gain = conn[p] - conn[cur];
            if (gain > bestgain ||
                (gain == bestgain && best >= 0 && pw[p] < pw[best])) {
                best = p;
                bestgain = gain;
            }
        }
        // overweight source: take the least-bad move out; balanced
        // source: positive gain only (zero-gain moves allowed when they
        // strictly improve balance, to escape plateaus)
        bool take = best >= 0 &&
            (over || bestgain > 0.0 ||
             (bestgain == 0.0 && pw[best] + g.vw[v] < pw[cur]));
        if (take) {
            pw[cur] -= g.vw[v];
            pw[best] += g.vw[v];
            part[v] = best;
            moves++;
        }
        for (i64 p : touched) conn[p] = 0.0;
    }
    return moves;
}

// Force feasibility: drain overweight parts into the lightest parts,
// preferring vertices with the smallest connectivity loss.
static void rebalance(const Graph& g, i64 k, std::vector<i64>& part,
                      std::vector<i64>& pw, i64 maxw) {
    std::vector<double> conn(k, 0.0);
    std::vector<i64> touched;
    for (i64 round = 0; round < 2 * k; round++) {
        i64 src = -1;
        for (i64 p = 0; p < k; p++)
            if (pw[p] > maxw && (src < 0 || pw[p] > pw[src])) src = p;
        if (src < 0) return;
        // walk src's vertices, move each to its best part with room
        // until src fits
        for (i64 v = 0; v < g.n && pw[src] > maxw; v++) {
            if (part[v] != src) continue;
            touched.clear();
            for (i64 e = g.xadj[v]; e < g.xadj[v + 1]; e++) {
                i64 p = part[g.adj[e]];
                if (conn[p] == 0.0) touched.push_back(p);
                conn[p] += g.ew[e];
            }
            i64 best = -1;
            double bestgain = -1e300;
            for (i64 p : touched) {
                if (p == src || pw[p] + g.vw[v] > maxw) continue;
                double gain = conn[p] - conn[src];
                if (gain > bestgain) { best = p; bestgain = gain; }
            }
            if (best < 0) {   // no adjacent part has room: lightest part
                for (i64 p = 0; p < k; p++)
                    if (p != src && (best < 0 || pw[p] < pw[best]))
                        best = p;
            }
            for (i64 p : touched) conn[p] = 0.0;
            if (best >= 0 && pw[best] + g.vw[v] <= maxw) {
                pw[src] -= g.vw[v];
                pw[best] += g.vw[v];
                part[v] = best;
            }
        }
    }
}

static void refine(const Graph& g, i64 k, std::vector<i64>& part) {
    std::vector<i64> pw(k, 0);
    i64 total = 0;
    for (i64 v = 0; v < g.n; v++) { pw[part[v]] += g.vw[v]; total += g.vw[v]; }
    i64 maxw = (i64)std::ceil(1.05 * (double)total / (double)k);
    for (i64 sweep = 0; sweep < 12; sweep++)
        if (refine_sweep(g, k, part, pw, maxw) == 0) break;
    rebalance(g, k, part, pw, maxw);
    for (i64 sweep = 0; sweep < 6; sweep++)
        if (refine_sweep(g, k, part, pw, maxw) == 0) break;
}

static double edge_cut(const Graph& g, const std::vector<i64>& part) {
    double cut = 0.0;
    for (i64 v = 0; v < g.n; v++)
        for (i64 e = g.xadj[v]; e < g.xadj[v + 1]; e++)
            if (part[g.adj[e]] != part[v]) cut += g.ew[e];
    return 0.5 * cut;   // symmetric: each edge seen twice
}

}  // namespace kway

extern "C" {

// n, indptr/indices: symmetric no-self-loop adjacency CSR. ew may be null.
// part[n] out. Returns edge cut scaled by 2^20 (integer ABI).
i64 partition_kway(i64 n, const i64* indptr, const i64* indices,
                   const double* ew, i64 k, i64* part) {
    using namespace kway;
    if (k <= 1 || n == 0) {
        for (i64 v = 0; v < n; v++) part[v] = 0;
        return 0;
    }
    Graph g;
    g.n = n;
    g.xadj.assign(indptr, indptr + n + 1);
    g.adj.assign(indices, indices + indptr[n]);
    if (ew) g.ew.assign(ew, ew + indptr[n]);
    else g.ew.assign(indptr[n], 1.0);
    g.vw.assign(n, 1);

    Lcg rng(0x5eedULL);
    // coarsen until small or stalled
    std::vector<Graph> levels;
    std::vector<std::vector<i64>> maps;
    levels.push_back(std::move(g));
    i64 stop_n = std::max<i64>(24 * k, 256);
    i64 max_vwt = std::max<i64>(1, (i64)(1.5 * (double)n / (double)stop_n));
    while (levels.back().n > stop_n) {
        std::vector<i64> cmap;
        i64 nc = hem_match(levels.back(), cmap, rng, max_vwt);
        if (nc > (i64)(0.95 * (double)levels.back().n)) break;  // stalled
        Graph c = contract(levels.back(), cmap, nc);
        maps.push_back(std::move(cmap));
        levels.push_back(std::move(c));
    }

    // initial partition on the coarsest level: several random restarts,
    // keep the best refined cut
    std::vector<i64> cpart;
    double best_cut = 1e300;
    for (i64 trial = 0; trial < 4; trial++) {
        std::vector<i64> cand;
        init_partition(levels.back(), k, cand, rng);
        refine(levels.back(), k, cand);
        double cut = edge_cut(levels.back(), cand);
        if (cut < best_cut) { best_cut = cut; cpart.swap(cand); }
    }

    // uncoarsen with refinement at every level
    for (i64 li = (i64)maps.size() - 1; li >= 0; li--) {
        const std::vector<i64>& cmap = maps[li];
        const Graph& fine = levels[li];
        std::vector<i64> fpart(fine.n);
        for (i64 v = 0; v < fine.n; v++) fpart[v] = cpart[cmap[v]];
        refine(fine, k, fpart);
        cpart.swap(fpart);
    }
    for (i64 v = 0; v < n; v++) part[v] = cpart[v];
    return (i64)(edge_cut(levels.front(), cpart) * 1048576.0);
}

}  // extern "C"
