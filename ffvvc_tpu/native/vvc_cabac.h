/* Shared declarations for the native CABAC engine + residual decoder
 * (vvc_cabac.c) so other native units (vvc_parse.c) can drive them
 * in-process.  Mirrors ffvvc_tpu/cabac/native.py's ctypes layout. */
#ifndef VVC_CABAC_H
#define VVC_CABAC_H

#include <stdint.h>

typedef struct {
    const uint8_t *data;
    long nbits;
    long pos;
    uint32_t range;
    uint32_t offset;
    int32_t *s0, *s1, *sh0, *sh1;   /* context state arrays (numpy int32) */
    /* buffered read-ahead: cache holds bits [pos, pos + cache_n) left-
     * aligned; reset by cabac_init / cabac_set_pos */
    uint64_t cache;
    int32_t cache_n;
} Cabac;

void cabac_init(Cabac *c, const uint8_t *data, long nbits, long bit_pos,
                int32_t *s0, int32_t *s1, int32_t *sh0, int32_t *sh1);
int cabac_decode_bin(Cabac *c, int idx);
int cabac_decode_bypass(Cabac *c);
int cabac_decode_bypass_bits(Cabac *c, int n);
int cabac_decode_terminate(Cabac *c);
int cabac_truncated_binary(Cabac *c, int c_max);
int cabac_limited_egk(Cabac *c, int k, int max_pre_ext_len,
                      int trunc_suffix_len);
long cabac_pos(Cabac *c);
void cabac_set_pos(Cabac *c, long pos);

typedef struct {
    /* geometry */
    int w, h, log2_w, log2_h, c_idx;
    int log2_zo_w, log2_zo_h;
    int ts;                  /* transform-skip path */
    int bdpcm;
    /* flags */
    int dep_quant, sdh, reverse_last;
    int persistent_rice, rrc_rice_ext, bd_gt12, is_i_slice;
    int log2_transform_range;
    int max_ts_cu_size_bins;  /* ts path: remaining ctx bins budget (in/out) */
    /* ctx bases */
    int ctx_sig, ctx_last_x, ctx_last_y, ctx_sb_coded, ctx_gtx, ctx_par;
    int ctx_ts_sig, ctx_ts_sign, ctx_ts_gtx, ctx_ts_par, ctx_ts_lrg1;
    /* state in/out */
    int stat_coeff;          /* stat_coeff[c_idx] */
    /* outputs */
    int max_scan_x, max_scan_y, min_scan_x, min_scan_y;
    int lfnst_dc_only, lfnst_zero_out, mts_dc_only, mts_zero_out;
    /* transform-skip path */
    int ts_rice;             /* sh_ts_residual_coding_rice_idx_minus1 + 1 */
} ResParams;

int decode_residual_ts(Cabac *c, ResParams *pp, int32_t *coeffs,
                       const uint8_t *sb_sx, const uint8_t *sb_sy,
                       const uint8_t *sx, const uint8_t *sy);

int decode_residual_regular(Cabac *c, ResParams *pp, int32_t *coeffs,
                            const uint8_t *sb_sx, const uint8_t *sb_sy,
                            const uint8_t *sx, const uint8_t *sy);

#endif /* VVC_CABAC_H */
