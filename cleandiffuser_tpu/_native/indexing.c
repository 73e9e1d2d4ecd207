/* Native fast path for sequence-window index building.
 *
 * TPU-native equivalent of the reference's one native-performance routine:
 * the numba-JIT `create_indices` (reference
 * cleandiffuser/dataset/dataset_utils.py:27-64). numba is unavailable in
 * this environment; this is a small C library loaded via ctypes with a
 * vectorized-numpy fallback (cleandiffuser_tpu/dataset/dataset_utils.py).
 *
 * Build: make -C cleandiffuser_tpu/_native
 */

#include <stdint.h>

static int64_t clamp(int64_t v, int64_t lo, int64_t hi) {
    if (v < lo) return lo;
    if (v > hi) return hi;
    return v;
}

/* Returns the number of index rows that create_indices would produce. */
int64_t count_indices(const int64_t *episode_ends, int64_t n_eps,
                      int64_t seq_len, int64_t pad_before, int64_t pad_after) {
    pad_before = clamp(pad_before, 0, seq_len - 1);
    pad_after = clamp(pad_after, 0, seq_len - 1);
    int64_t total = 0;
    int64_t start_idx = 0;
    for (int64_t i = 0; i < n_eps; ++i) {
        int64_t end_idx = episode_ends[i];
        int64_t ep_len = end_idx - start_idx;
        int64_t min_start = -pad_before;
        int64_t max_start = ep_len - seq_len + pad_after;
        if (max_start >= min_start) total += max_start - min_start + 1;
        start_idx = end_idx;
    }
    return total;
}

/* Fills out[(4*k)..(4*k+3)] = {buffer_start, buffer_end, sample_start,
 * sample_end} for every window k. Returns rows written. */
int64_t create_indices(const int64_t *episode_ends, int64_t n_eps,
                       int64_t seq_len, int64_t pad_before, int64_t pad_after,
                       int64_t *out) {
    pad_before = clamp(pad_before, 0, seq_len - 1);
    pad_after = clamp(pad_after, 0, seq_len - 1);
    int64_t k = 0;
    int64_t start_idx = 0;
    for (int64_t i = 0; i < n_eps; ++i) {
        int64_t end_idx = episode_ends[i];
        int64_t ep_len = end_idx - start_idx;
        int64_t min_start = -pad_before;
        int64_t max_start = ep_len - seq_len + pad_after;
        for (int64_t idx = min_start; idx <= max_start; ++idx) {
            int64_t buffer_start = (idx > 0 ? idx : 0) + start_idx;
            int64_t bend = idx + seq_len;
            if (bend > ep_len) bend = ep_len;
            int64_t buffer_end = bend + start_idx;
            int64_t start_offset = buffer_start - (idx + start_idx);
            int64_t end_offset = (idx + seq_len + start_idx) - buffer_end;
            out[4 * k + 0] = buffer_start;
            out[4 * k + 1] = buffer_end;
            out[4 * k + 2] = start_offset;
            out[4 * k + 3] = seq_len - end_offset;
            ++k;
        }
        start_idx = end_idx;
    }
    return k;
}

/* Padded window gather rows: for each window, write seq_len source row
 * indices with edge replication (used to precompute device gather tables,
 * dataset/pusht.py:_build_device_cache). */
void window_rows(const int64_t *indices, int64_t n_windows, int64_t seq_len,
                 int64_t *out) {
    for (int64_t w = 0; w < n_windows; ++w) {
        int64_t b_start = indices[4 * w + 0];
        int64_t b_end = indices[4 * w + 1];
        int64_t s_start = indices[4 * w + 2];
        int64_t s_end = indices[4 * w + 3];
        int64_t *row = out + w * seq_len;
        for (int64_t t = 0; t < seq_len; ++t) {
            if (t < s_start) row[t] = b_start;
            else if (t >= s_end) row[t] = b_end - 1;
            else row[t] = b_start + (t - s_start);
        }
    }
}
