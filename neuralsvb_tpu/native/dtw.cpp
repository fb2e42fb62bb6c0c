// Native DTW dynamic-programming kernel.
//
// TPU-native replacement for the reference's numba-JIT DTW inner loop
// (reference: modules/voice_conversion/dtw/align.py:8-37). The DP recurrence
// and backtrace are inherently sequential, so they live on the host as
// optimized C++ (single pass, cache-friendly row layout) while the O(S*T*M)
// cost-matrix construction is vectorized in numpy/JAX.
//
// Semantics match align_from_distances exactly:
//   dtw[0, 1:] = inf; dtw[1:, 0] = inf
//   dtw[i, j]  = cost[i, j] + min(dtw[i-1,j], dtw[i,j-1], dtw[i-1,j-1])
//   backtrace from (R-1, C-1); ties prefer (i-1,j), then (i,j-1), then
//   (i-1,j-1) (Python min() keeps the first minimal element);
//   results[i] = last j visited in row i; row 0 stays 0.

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// cost: row-major [rows, cols]; path_out: [rows] best column per row.
// Returns total alignment cost at (rows-1, cols-1).
double dtw_align(const float* cost, int64_t rows, int64_t cols, int32_t* path_out) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> prev(cols), cur(cols);

    // row 0: dtw[0,0] = 0 (reference leaves the zeros_like value); dtw[0,1:] = inf
    prev[0] = 0.0;
    for (int64_t j = 1; j < cols; ++j) prev[j] = INF;

    // Full DP table is needed for the backtrace; keep a compact row-major
    // copy of the argmin direction instead of the doubles (4x smaller).
    // dir: 0 = up (i-1,j), 1 = left (i,j-1), 2 = diag (i-1,j-1)
    std::vector<uint8_t> dir((size_t)rows * cols, 0);

    for (int64_t i = 1; i < rows; ++i) {
        const float* crow = cost + i * cols;
        uint8_t* drow = dir.data() + (size_t)i * cols;
        cur[0] = INF;
        for (int64_t j = 1; j < cols; ++j) {
            double up = prev[j], left = cur[j - 1], diag = prev[j - 1];
            double best = up;
            uint8_t d = 0;
            if (left < best) { best = left; d = 1; }
            if (diag < best) { best = diag; d = 2; }
            cur[j] = crow[j] + best;
            drow[j] = d;
        }
        std::swap(prev, cur);
    }
    double total = prev[cols - 1];

    // Backtrace; matches the reference's "results[i] = j then move" loop.
    std::memset(path_out, 0, sizeof(int32_t) * rows);
    int64_t i = rows - 1, j = cols - 1;
    while (i > 0 && j > 0) {
        path_out[i] = (int32_t)j;
        uint8_t d = dir[(size_t)i * cols + j];
        if (d == 0) { i -= 1; }
        else if (d == 1) { j -= 1; }
        else { i -= 1; j -= 1; }
    }
    return total;
}

}  // extern "C"
