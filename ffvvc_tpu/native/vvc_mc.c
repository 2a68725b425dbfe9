/* Native inter MC kernels: replicate-padded fetch + 8-tap (luma) / 4-tap
 * (chroma) separable interpolation into the 14-bit intermediate domain,
 * and the uni / bi-average / weighted output stages.
 *
 * Transliterated from ffvvc_tpu/inter.py (_gather_block, _filter_h/_v,
 * _mc_put, _uni_out, _avg, _w_avg), which remains the golden model.
 * Reference analogue: /root/reference/libavcodec/h26x/
 * h2656_inter_template.c:1-577 + x86/h26x/h2656_inter.asm (the hottest
 * kernels per SURVEY §2.2) — re-expressed from our Python model.
 */
#include <stdint.h>
#include <string.h>

static inline int iclip(int v, int lo, int hi)
{ return v < lo ? lo : (v > hi ? hi : v); }

/* replicate-padded sample fetch (emulated_edge semantics; optional DMVR
 * prefetch box, inclusive bounds) */
static inline int32_t fetch(const int32_t *ref, long stride, int W, int H,
                            int x, int y, int has_box, int bx0, int bx1,
                            int by0, int by1)
{
    if (has_box) {
        x = iclip(x, bx0, bx1);
        y = iclip(y, by0, by1);
    }
    x = iclip(x, 0, W - 1);
    y = iclip(y, 0, H - 1);
    return ref[(long)y * stride + x];
}

/* put[is_luma][!!frac_y][!!frac_x]: dst [h][w] int32, 14-bit domain */
void mc_put(int32_t *dst, const int32_t *ref, long stride, int W, int H,
            int x_int, int y_int, int frac_x, int frac_y, int w, int h,
            int is_luma, const int32_t *hf, const int32_t *vf, int bd,
            int has_box, int bx0, int bx1, int by0, int by1)
{
    int taps = is_luma ? 8 : 4;
    int eb = is_luma ? 3 : 1;
    if (!frac_x && !frac_y) {
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++)
                dst[yy * w + xx] = fetch(ref, stride, W, H, x_int + xx,
                                         y_int + yy, has_box, bx0, bx1,
                                         by0, by1) << (14 - bd);
        return;
    }
    if (!frac_y) {
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++) {
                int32_t acc = 0;
                for (int k = 0; k < taps; k++)
                    acc += hf[k] * fetch(ref, stride, W, H,
                                         x_int - eb + xx + k, y_int + yy,
                                         has_box, bx0, bx1, by0, by1);
                dst[yy * w + xx] = acc >> (bd - 8);
            }
        return;
    }
    if (!frac_x) {
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++) {
                int32_t acc = 0;
                for (int k = 0; k < taps; k++)
                    acc += vf[k] * fetch(ref, stride, W, H, x_int + xx,
                                         y_int - eb + yy + k,
                                         has_box, bx0, bx1, by0, by1);
                dst[yy * w + xx] = acc >> (bd - 8);
            }
        return;
    }
    /* h then v, via a tmp of (h + taps - 1) rows */
    int32_t tmp[(128 + 7) * 128];
    int th = h + taps - 1;
    for (int yy = 0; yy < th; yy++)
        for (int xx = 0; xx < w; xx++) {
            int32_t acc = 0;
            for (int k = 0; k < taps; k++)
                acc += hf[k] * fetch(ref, stride, W, H, x_int - eb + xx + k,
                                     y_int - eb + yy, has_box, bx0, bx1,
                                     by0, by1);
            tmp[yy * w + xx] = acc >> (bd - 8);
        }
    for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++) {
            int32_t acc = 0;
            for (int k = 0; k < taps; k++)
                acc += vf[k] * tmp[(yy + k) * w + xx];
            dst[yy * w + xx] = acc >> 6;
        }
}

/* put_uni / put_uni_w: 14-bit val -> pixels into the plane */
void mc_uni_out(int32_t *plane, long stride, int x, int y,
                const int32_t *val, int w, int h, int bd, int weighted,
                int denom, int wx, int ox)
{
    int mx = (1 << bd) - 1;
    if (!weighted) {
        int shift = 14 - bd;
        int off = 1 << (shift - 1);
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++)
                plane[(long)(y + yy) * stride + x + xx] =
                    iclip((val[yy * w + xx] + off) >> shift, 0, mx);
        return;
    }
    int shift = denom + 14 - bd;
    long long off = shift > 0 ? 1LL << (shift - 1) : 0;
    long long oxs = (long long)ox << (bd - 8);
    for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++) {
            long long v = (((long long)val[yy * w + xx] * wx + off)
                           >> shift) + oxs;
            plane[(long)(y + yy) * stride + x + xx] =
                (int32_t)(v < 0 ? 0 : (v > mx ? mx : v));
        }
}

void mc_avg(int32_t *plane, long stride, int x, int y, const int32_t *s0,
            const int32_t *s1, int w, int h, int bd)
{
    int shift = 15 - bd;
    if (shift < 3) shift = 3;
    int off = 1 << (shift - 1);
    int mx = (1 << bd) - 1;
    for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++)
            plane[(long)(y + yy) * stride + x + xx] =
                iclip((s0[yy * w + xx] + s1[yy * w + xx] + off) >> shift,
                      0, mx);
}

void mc_w_avg(int32_t *plane, long stride, int x, int y, const int32_t *s0,
              const int32_t *s1, int w, int h, int bd, int denom, int w0,
              int w1, int o0, int o1)
{
    int shift = denom + (15 - bd > 3 ? 15 - bd : 3);
    long long off = (long long)((((o0 + o1) << (bd - 8)) + 1)) <<
                    (shift - 1);
    int mx = (1 << bd) - 1;
    for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++) {
            long long v = ((long long)s0[yy * w + xx] * w0 +
                           (long long)s1[yy * w + xx] * w1 + off) >> shift;
            plane[(long)(y + yy) * stride + x + xx] =
                (int32_t)(v < 0 ? 0 : (v > mx ? mx : v));
        }
}
