// Native symbolic-structure helpers for the TPU bundle-adjustment engine.
//
// Enumerates, per landmark, every ordered pair (i <= j) of its observing
// both-free edges -- the multiply plan for the Schur complement
//   Hsc(p_i, p_j) -= Hpl(e_i) inv(Hll) Hpl(e_j)^T.
// This is the host-side hot loop of structure analysis (the functional
// equivalent of the reference's HschurSparseBlockMatrix::constructFromVertices,
// /root/reference/src/sparse_block_matrix.cpp:63-156, plus
// findHschureMulBlockIndicesKernel, cuda_block_solver.cu:1347-1378).
//
// Inputs are pre-sorted by (landmark, pose, edge id); the Python wrapper
// (solver/native_symbolic.py) does the sort with numpy and owns all memory.
//
// Build: python -m cuda_bundle_adjustment_tpu.native.build

#include <cstdint>

extern "C" {

// Count pairs sum_g n_g*(n_g+1)/2 over contiguous groups of equal landmark id,
// plus one extra per same-pose distinct-edge pair (diagonal blocks need both
// multiply orders since densification does not mirror them).
int64_t tba_count_pairs(const int64_t* pose_sorted, const int64_t* lm_sorted, int64_t n)
{
    int64_t total = 0;
    int64_t i = 0;
    while (i < n)
    {
        int64_t j = i + 1;
        while (j < n && lm_sorted[j] == lm_sorted[i])
        {
            ++j;
        }
        const int64_t g = j - i;
        total += g * (g + 1) / 2;
        // same-pose runs inside the (already pose-sorted) group
        int64_t a = i;
        while (a < j)
        {
            int64_t b = a + 1;
            while (b < j && pose_sorted[b] == pose_sorted[a])
            {
                ++b;
            }
            const int64_t r = b - a;
            total += r * (r - 1) / 2;  // swapped copies of distinct-edge pairs
            a = b;
        }
        i = j;
    }
    return total;
}

// Emit pair keys (p_i * Pa + p_j) and the edge-id pairs, in group order.
void tba_enumerate_pairs(
    const int64_t* eid_sorted,
    const int64_t* pose_sorted,
    const int64_t* lm_sorted,
    int64_t n,
    int64_t Pa,
    int64_t* out_pair_keys,
    int64_t* out_tri_ei,
    int64_t* out_tri_ej)
{
    int64_t out = 0;
    int64_t i = 0;
    while (i < n)
    {
        int64_t j = i + 1;
        while (j < n && lm_sorted[j] == lm_sorted[i])
        {
            ++j;
        }
        for (int64_t a = i; a < j; ++a)
        {
            const int64_t pa = pose_sorted[a];
            const int64_t ea = eid_sorted[a];
            for (int64_t b = a; b < j; ++b)
            {
                out_pair_keys[out] = pa * Pa + pose_sorted[b];
                out_tri_ei[out] = ea;
                out_tri_ej[out] = eid_sorted[b];
                ++out;
                if (b != a && pose_sorted[b] == pa)
                {
                    // diagonal block: also emit the swapped order
                    out_pair_keys[out] = pa * Pa + pa;
                    out_tri_ei[out] = eid_sorted[b];
                    out_tri_ej[out] = ea;
                    ++out;
                }
            }
        }
        i = j;
    }
}

}  // extern "C"
