/* Native deblocking edge filters (H.266 8.8.3 luma/chroma kernels).
 *
 * Transliterated from ffvvc_tpu/deblock.py (_filter_luma/_filter_chroma and
 * the strong/weak/large kernels), which is the golden model; bit-exactness
 * arbitrated by the oracle-differential suite.
 * Reference analogue: /root/reference/libavcodec/vvc/vvc_filter_template.c
 * :466-787 (loop_filter_luma/chroma).
 */
#include <stdint.h>
#include <stdlib.h>

typedef struct {
    int32_t *plane;
    long stride;
    int x, y, vertical;
} Edge;

static inline int32_t eget(const Edge *e, int off, int line)
{
    if (e->vertical)
        return e->plane[(e->y + line) * e->stride + e->x + off];
    return e->plane[(e->y + off) * e->stride + e->x + line];
}

static inline void eset(Edge *e, int off, int line, int32_t v)
{
    if (e->vertical)
        e->plane[(e->y + line) * e->stride + e->x + off] = v;
    else
        e->plane[(e->y + off) * e->stride + e->x + line] = v;
}

static inline int iclip(int v, int lo, int hi)
{
    return v < lo ? lo : (v > hi ? hi : v);
}

static inline int iabs(int v) { return v < 0 ? -v : v; }

#define P(k, line) eget(e, -(k) - 1, line)
#define Q(k, line) eget(e, (k), line)

static void luma_large(Edge *e, int tc, int ml_p, int ml_q)
{
    static const int coef3[3] = {53, 32, 11};
    static const int coef5[5] = {58, 45, 32, 19, 6};
    static const int coef7[7] = {59, 50, 41, 32, 23, 14, 5};
    static const int tcw3[3] = {6, 4, 2};
    static const int tcw5[5] = {6, 5, 4, 3, 2};
    static const int tcw7[7] = {6, 5, 4, 3, 2, 1, 1};
    const int *cp = ml_p == 3 ? coef3 : (ml_p == 5 ? coef5 : coef7);
    const int *cq = ml_q == 3 ? coef3 : (ml_q == 5 ? coef5 : coef7);
    const int *twp = ml_p == 3 ? tcw3 : (ml_p == 5 ? tcw5 : tcw7);
    const int *twq = ml_q == 3 ? tcw3 : (ml_q == 5 ? tcw5 : tcw7);
    for (int d = 0; d < 4; d++) {
        int p[8], q[8];
        for (int k = 0; k < 8; k++) {
            p[k] = P(k, d);
            q[k] = Q(k, d);
        }
        int m;
        if (ml_p == 5 && ml_q == 5)
            m = (p[4] + p[3] + 2 * (p[2] + p[1] + p[0] + q[0] + q[1] + q[2])
                 + q[3] + q[4] + 8) >> 4;
        else if (ml_p == ml_q)
            m = (p[6] + p[5] + p[4] + p[3] + p[2] + p[1] +
                 2 * (p[0] + q[0]) + q[1] + q[2] + q[3] + q[4] + q[5] +
                 q[6] + 8) >> 4;
        else if (ml_p + ml_q == 12)
            m = (p[5] + p[4] + p[3] + p[2] +
                 2 * (p[1] + p[0] + q[0] + q[1]) + q[2] + q[3] + q[4] +
                 q[5] + 8) >> 4;
        else if (ml_p + ml_q == 8)
            m = (p[3] + p[2] + p[1] + p[0] + q[0] + q[1] + q[2] + q[3]
                 + 4) >> 3;
        else if (ml_q == 7)
            m = (2 * (p[2] + p[1] + p[0] + q[0]) + p[0] + p[1] + q[1] +
                 q[2] + q[3] + q[4] + q[5] + q[6] + 8) >> 4;
        else
            m = (p[6] + p[5] + p[4] + p[3] + p[2] + p[1] +
                 2 * (q[2] + q[1] + q[0] + p[0]) + q[0] + q[1] + 8) >> 4;
        int refp = (p[ml_p] + p[ml_p - 1] + 1) >> 1;
        int refq = (q[ml_q] + q[ml_q - 1] + 1) >> 1;
        for (int k = 0; k < ml_p; k++) {
            int lim = tc * twp[k] >> 1;
            int v = p[k] + iclip(((m * cp[k] + refp * (64 - cp[k]) + 32)
                                  >> 6) - p[k], -lim, lim);
            eset(e, -k - 1, d, v);
        }
        for (int k = 0; k < ml_q; k++) {
            int lim = tc * twq[k] >> 1;
            int v = q[k] + iclip(((m * cq[k] + refq * (64 - cq[k]) + 32)
                                  >> 6) - q[k], -lim, lim);
            eset(e, k, d, v);
        }
    }
}

static void luma_strong(Edge *e, int tc)
{
    int tc2 = tc << 1, tc3 = tc * 3;
    for (int d = 0; d < 4; d++) {
        int p3 = P(3, d), p2 = P(2, d), p1 = P(1, d), p0 = P(0, d);
        int q0 = Q(0, d), q1 = Q(1, d), q2 = Q(2, d), q3 = Q(3, d);
        eset(e, -1, d, p0 + iclip(((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0, -tc3, tc3));
        eset(e, -2, d, p1 + iclip(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, -tc2, tc2));
        eset(e, -3, d, p2 + iclip(((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2, -tc, tc));
        eset(e, 0, d, q0 + iclip(((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3) - q0, -tc3, tc3));
        eset(e, 1, d, q1 + iclip(((p0 + q0 + q1 + q2 + 2) >> 2) - q1, -tc2, tc2));
        eset(e, 2, d, q2 + iclip(((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2, -tc, tc));
    }
}

static void luma_weak(Edge *e, int tc, int nd_p, int nd_q, int mx)
{
    int tc_2 = tc >> 1;
    for (int d = 0; d < 4; d++) {
        int p2 = P(2, d), p1 = P(1, d), p0 = P(0, d);
        int q0 = Q(0, d), q1 = Q(1, d), q2 = Q(2, d);
        int delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4;
        if (iabs(delta0) < 10 * tc) {
            delta0 = iclip(delta0, -tc, tc);
            eset(e, -1, d, iclip(p0 + delta0, 0, mx));
            eset(e, 0, d, iclip(q0 - delta0, 0, mx));
            if (nd_p > 1) {
                int dp1 = iclip((((p2 + p0 + 1) >> 1) - p1 + delta0) >> 1,
                                -tc_2, tc_2);
                eset(e, -2, d, iclip(p1 + dp1, 0, mx));
            }
            if (nd_q > 1) {
                int dq1 = iclip((((q2 + q0 + 1) >> 1) - q1 - delta0) >> 1,
                                -tc_2, tc_2);
                eset(e, 1, d, iclip(q1 + dq1, 0, mx));
            }
        }
    }
}

void deblock_filter_luma(int32_t *plane, long stride, int px, int py,
                         int vertical, const int32_t *beta_a,
                         const int32_t *tc_a, const int32_t *mlp_a,
                         const int32_t *mlq_a, int hor_ctu_edge, int bd,
                         int mx)
{
    for (int i = 0; i < 2; i++) {
        int tc0 = tc_a[i];
        int tc = bd < 10 ? (tc0 + (1 << (9 - bd))) >> (10 - bd)
                         : tc0 << (bd - 10);
        if (!tc)
            continue;
        Edge ee;
        ee.plane = plane;
        ee.stride = stride;
        ee.vertical = vertical;
        if (vertical) { ee.x = px; ee.y = py + i * 4; }
        else { ee.x = px + i * 4; ee.y = py; }
        Edge *e = &ee;
        int dp0 = iabs(P(2, 0) - 2 * P(1, 0) + P(0, 0));
        int dq0 = iabs(Q(2, 0) - 2 * Q(1, 0) + Q(0, 0));
        int dp3 = iabs(P(2, 3) - 2 * P(1, 3) + P(0, 3));
        int dq3 = iabs(Q(2, 3) - 2 * Q(1, 3) + Q(0, 3));
        int d0 = dp0 + dq0;
        int d3 = dp3 + dq3;
        int tc25 = (tc * 5 + 1) >> 1;
        int max_len_p = mlp_a[i];
        int max_len_q = mlq_a[i];
        int large_p = max_len_p > 3 && !hor_ctu_edge;
        int large_q = max_len_q > 3;
        int beta = beta_a[i] << (bd - 8);
        int beta_3 = beta >> 3;
        int beta_2 = beta >> 2;
        if (large_p || large_q) {
            int dp0l = large_p ? ((dp0 + iabs(P(5, 0) - 2 * P(4, 0) + P(3, 0)) + 1) >> 1) : dp0;
            int dq0l = large_q ? ((dq0 + iabs(Q(5, 0) - 2 * Q(4, 0) + Q(3, 0)) + 1) >> 1) : dq0;
            int dp3l = large_p ? ((dp3 + iabs(P(5, 3) - 2 * P(4, 3) + P(3, 3)) + 1) >> 1) : dp3;
            int dq3l = large_q ? ((dq3 + iabs(Q(5, 3) - 2 * Q(4, 3) + Q(3, 3)) + 1) >> 1) : dq3;
            int d0l = dp0l + dq0l;
            int d3l = dp3l + dq3l;
            int beta53 = beta * 3 >> 5;
            int beta_4 = beta >> 4;
            int ml_p = large_p ? max_len_p : 3;
            int ml_q = large_q ? max_len_q : 3;
            if (d0l + d3l < beta) {
                int sp0l = iabs(P(3, 0) - P(0, 0)) +
                    (ml_p == 7 ? iabs(P(7, 0) - P(6, 0) - P(5, 0) + P(4, 0)) : 0);
                int sq0l = iabs(Q(0, 0) - Q(3, 0)) +
                    (ml_q == 7 ? iabs(Q(4, 0) - Q(5, 0) - Q(6, 0) + Q(7, 0)) : 0);
                int sp3l = iabs(P(3, 3) - P(0, 3)) +
                    (ml_p == 7 ? iabs(P(7, 3) - P(6, 3) - P(5, 3) + P(4, 3)) : 0);
                int sq3l = iabs(Q(0, 3) - Q(3, 3)) +
                    (ml_q == 7 ? iabs(Q(4, 3) - Q(5, 3) - Q(6, 3) + Q(7, 3)) : 0);
                int sp0 = large_p ? ((sp0l + iabs(P(3, 0) - P(ml_p, 0)) + 1) >> 1) : sp0l;
                int sp3 = large_p ? ((sp3l + iabs(P(3, 3) - P(ml_p, 3)) + 1) >> 1) : sp3l;
                int sq0 = large_q ? ((sq0l + iabs(Q(3, 0) - Q(ml_q, 0)) + 1) >> 1) : sq0l;
                int sq3 = large_q ? ((sq3l + iabs(Q(3, 3) - Q(ml_q, 3)) + 1) >> 1) : sq3l;
                if (sp0 + sq0 < beta53 && iabs(P(0, 0) - Q(0, 0)) < tc25 &&
                    sp3 + sq3 < beta53 && iabs(P(0, 3) - Q(0, 3)) < tc25 &&
                    (d0l << 1) < beta_4 && (d3l << 1) < beta_4) {
                    luma_large(e, tc, ml_p, ml_q);
                    continue;
                }
            }
        }
        if (d0 + d3 < beta) {
            if (max_len_p > 2 && max_len_q > 2 &&
                iabs(P(3, 0) - P(0, 0)) + iabs(Q(3, 0) - Q(0, 0)) < beta_3 &&
                iabs(P(0, 0) - Q(0, 0)) < tc25 &&
                iabs(P(3, 3) - P(0, 3)) + iabs(Q(3, 3) - Q(0, 3)) < beta_3 &&
                iabs(P(0, 3) - Q(0, 3)) < tc25 &&
                (d0 << 1) < beta_2 && (d3 << 1) < beta_2) {
                luma_strong(e, tc);
            } else {
                int nd_p = 1, nd_q = 1;
                if (max_len_p > 1 && max_len_q > 1) {
                    if (dp0 + dp3 < ((beta + (beta >> 1)) >> 3))
                        nd_p = 2;
                    if (dq0 + dq3 < ((beta + (beta >> 1)) >> 3))
                        nd_q = 2;
                }
                luma_weak(e, tc, nd_p, nd_q, mx);
            }
        }
    }
}

static void chroma_strong(Edge *e, int size, int tc)
{
    for (int d = 0; d < size; d++) {
        int p3 = P(3, d), p2 = P(2, d), p1 = P(1, d), p0 = P(0, d);
        int q0 = Q(0, d), q1 = Q(1, d), q2 = Q(2, d), q3 = Q(3, d);
        eset(e, -1, d, iclip((p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3, p0 - tc, p0 + tc));
        eset(e, -2, d, iclip((2 * p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3, p1 - tc, p1 + tc));
        eset(e, -3, d, iclip((3 * p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3, p2 - tc, p2 + tc));
        eset(e, 0, d, iclip((p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3, q0 - tc, q0 + tc));
        eset(e, 1, d, iclip((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3, q1 - tc, q1 + tc));
        eset(e, 2, d, iclip((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3, q2 - tc, q2 + tc));
    }
}

static void chroma_strong_one_side(Edge *e, int size, int tc)
{
    for (int d = 0; d < size; d++) {
        int p1 = P(1, d), p0 = P(0, d);
        int q0 = Q(0, d), q1 = Q(1, d), q2 = Q(2, d), q3 = Q(3, d);
        eset(e, -1, d, iclip((3 * p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3, p0 - tc, p0 + tc));
        eset(e, 0, d, iclip((2 * p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3, q0 - tc, q0 + tc));
        eset(e, 1, d, iclip((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3, q1 - tc, q1 + tc));
        eset(e, 2, d, iclip((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3, q2 - tc, q2 + tc));
    }
}

static void chroma_weak(Edge *e, int size, int tc, int mx)
{
    for (int d = 0; d < size; d++) {
        int p1 = P(1, d), p0 = P(0, d);
        int q0 = Q(0, d), q1 = Q(1, d);
        int delta0 = iclip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc, tc);
        eset(e, -1, d, iclip(p0 + delta0, 0, mx));
        eset(e, 0, d, iclip(q0 - delta0, 0, mx));
    }
}

void deblock_filter_chroma(int32_t *plane, long stride, int px, int py,
                           int vertical, const int32_t *beta_a,
                           const int32_t *tc_a, const int32_t *mlp_a,
                           const int32_t *mlq_a, int shift, int bd, int mx)
{
    int size = shift ? 2 : 4;
    int end = 8 / size;
    for (int i = 0; i < end; i++) {
        int tc0 = tc_a[i];
        int tc = bd < 10 ? (tc0 + (1 << (9 - bd))) >> (10 - bd)
                         : tc0 << (bd - 10);
        if (!tc)
            continue;
        Edge ee;
        ee.plane = plane;
        ee.stride = stride;
        ee.vertical = vertical;
        if (vertical) { ee.x = px; ee.y = py + i * size; }
        else { ee.x = px + i * size; ee.y = py; }
        Edge *e = &ee;
        int max_len_p = mlp_a[i];
        int max_len_q = mlq_a[i];
        if (!max_len_p || !max_len_q)
            continue;
        int beta = beta_a[i] << (bd - 8);
        int beta_3 = beta >> 3;
        int beta_2 = beta >> 2;
        int tc25 = (tc * 5 + 1) >> 1;
        if (max_len_q == 3) {
            int nline = shift ? 1 : 3;
            int p1n = P(1, nline);
            int p2n = max_len_p == 1 ? P(1, nline) : P(2, nline);
            int p0n = P(0, nline);
            int q0n = Q(0, nline), q1n = Q(1, nline), q2n = Q(2, nline);
            int p3 = max_len_p == 1 ? P(1, 0) : P(3, 0);
            int p2 = max_len_p == 1 ? P(1, 0) : P(2, 0);
            int p1 = P(1, 0), p0 = P(0, 0);
            int dp0 = iabs(p2 - 2 * p1 + p0);
            int dq0 = iabs(Q(2, 0) - 2 * Q(1, 0) + Q(0, 0));
            int dp1 = iabs(p2n - 2 * p1n + p0n);
            int dq1 = iabs(q2n - 2 * q1n + q0n);
            int d0 = dp0 + dq0;
            int d1 = dp1 + dq1;
            if (d0 + d1 < beta) {
                int p3n = max_len_p == 1 ? p1n : P(3, nline);
                int q3n = Q(3, nline);
                int dsam0 = (d0 << 1) < beta_2 &&
                    (iabs(p3 - p0) + iabs(Q(0, 0) - Q(3, 0)) < beta_3) &&
                    iabs(p0 - Q(0, 0)) < tc25;
                int dsam1 = (d1 << 1) < beta_2 &&
                    (iabs(p3n - p0n) + iabs(q0n - q3n) < beta_3) &&
                    iabs(p0n - q0n) < tc25;
                if (!dsam0 || !dsam1)
                    max_len_p = max_len_q = 1;
            } else {
                max_len_p = max_len_q = 1;
            }
        }
        if (max_len_p == 3 && max_len_q == 3)
            chroma_strong(e, size, tc);
        else if (max_len_q == 3)
            chroma_strong_one_side(e, size, tc);
        else
            chroma_weak(e, size, tc, mx);
    }
}

/* ---- per-CTB edge driver (golden model: deblock.py deblock_ctb /
 * _filter_edge / _edge_qp / _ladf_qp_offset / _max_filter_length).
 * Reference analogue: /root/reference/libavcodec/vvc/vvc_filter.c:861-1000. */

static const int TC_TABLE_C[66] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 3, 4, 4, 4, 4, 5, 5, 5, 5, 7, 7, 8, 9, 10,
    10, 11, 13, 14, 15, 17, 19, 21, 24, 25, 29, 33, 36, 41, 45, 51,
    57, 64, 71, 80, 89, 100, 112, 125, 141, 157, 177, 198, 222, 250, 280, 314,
    352, 395};
static const int BETA_TABLE_C[64] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86, 88};

static int ladf_qp_offset_c(const int32_t *luma, long lstride, int x, int y,
                            int vertical, int n_ladf, int ladf_lowest,
                            const int32_t *ladf_offsets,
                            const int32_t *ladf_bounds)
{
    int level;
    if (vertical)
        level = (luma[(long)y * lstride + x - 1] +
                 luma[(long)(y + 3) * lstride + x - 1] +
                 luma[(long)y * lstride + x] +
                 luma[(long)(y + 3) * lstride + x]) >> 2;
    else
        level = (luma[(long)(y - 1) * lstride + x] +
                 luma[(long)(y - 1) * lstride + x + 3] +
                 luma[(long)y * lstride + x] +
                 luma[(long)y * lstride + x + 3]) >> 2;
    int qp_offset = ladf_lowest;
    for (int i = 0; i < n_ladf - 1; i++) {
        if (level <= ladf_bounds[i + 1])
            break;
        qp_offset = ladf_offsets[i];
    }
    return qp_offset;
}

void deblock_ctb_edges(
    int32_t *plane, long stride, int c_idx, int vertical,
    int x0, int y0, int x_end, int y_end,
    int grid, int step, int n, int hs, int vs, int ctb_size,
    const int32_t *bs_tab, const int32_t *mlp_tab, const int32_t *mlq_tab,
    const int32_t *tb_size_tab, const int32_t *qp_map, int w4,
    int beta_off, int tc_off, int qp_bd_offset, int bd, int mx,
    int n_ladf, int ladf_lowest, const int32_t *ladf_offsets,
    const int32_t *ladf_bounds)
{
    int dx = vertical ? 1 : 0, dy = vertical ? 0 : 1;
    int ys = vertical ? step : grid;
    for (int y = y0; y < y_end; y += ys) {
        int hor_ctu_edge = !vertical && (y % ctb_size) == 0;
        if (!vertical && y == 0)
            continue;
        int x = x0;
        int xs;
        if (vertical) {
            if (!x0)
                x = grid;
            xs = grid;
        } else {
            xs = step;
        }
        for (; x < x_end; x += xs) {
            int32_t bs[4], beta[4], tc[4], mlp[4], mlq[4];
            int all_zero = 1;
            for (int i = 0; i < n; i++) {
                int d = i << 2;
                int pos_x = vertical ? x : x + d;
                int pos_y = vertical ? y + d : y;
                int in_range = vertical ? pos_y < y_end : pos_x < x_end;
                bs[i] = in_range ? bs_tab[(pos_y >> 2) * w4 + (pos_x >> 2)]
                                 : 0;
                beta[i] = tc[i] = mlp[i] = mlq[i] = 0;
                if (!bs[i])
                    continue;
                int qp;
                int qp_p = qp_map[((pos_y - dy) >> 2) * w4 +
                                  ((pos_x - dx) >> 2)];
                int qp_q = qp_map[(pos_y >> 2) * w4 + (pos_x >> 2)];
                if (c_idx == 0) {
                    qp = (qp_p + qp_q + 1) >> 1;
                    if (n_ladf)
                        qp += ladf_qp_offset_c(plane, stride, pos_x, pos_y,
                                               vertical, n_ladf, ladf_lowest,
                                               ladf_offsets, ladf_bounds);
                } else {
                    qp = (qp_p + qp_q - 2 * qp_bd_offset + 1) >> 1;
                }
                beta[i] = BETA_TABLE_C[iclip(qp + beta_off, 0, 63)];
                tc[i] = TC_TABLE_C[iclip(qp + 2 * (bs[i] - 1) + (tc_off & -2),
                                         0, 65)];
                if (c_idx == 0) {
                    mlp[i] = mlp_tab[(pos_y >> 2) * w4 + (pos_x >> 2)];
                    mlq[i] = mlq_tab[(pos_y >> 2) * w4 + (pos_x >> 2)];
                } else {
                    int ppx = vertical ? pos_x - 1 : pos_x;
                    int ppy = vertical ? pos_y : pos_y - 1;
                    int size_p = tb_size_tab[(ppy >> 2) * w4 + (ppx >> 2)];
                    int size_q = tb_size_tab[(pos_y >> 2) * w4 +
                                             (pos_x >> 2)];
                    if (size_p >= 8 && size_q >= 8) {
                        mlp[i] = hor_ctu_edge ? 1 : 3;
                        mlq[i] = 3;
                    } else {
                        mlp[i] = mlq[i] = bs[i] == 2;
                    }
                }
                all_zero = 0;
            }
            if (all_zero)
                continue;
            int px = x >> hs, py = y >> vs;
            if (c_idx == 0)
                deblock_filter_luma(plane, stride, px, py, vertical,
                                    beta, tc, mlp, mlq, hor_ctu_edge, bd, mx);
            else
                deblock_filter_chroma(plane, stride, px, py, vertical,
                                      beta, tc, mlp, mlq,
                                      vertical ? vs : hs, bd, mx);
        }
    }
}
