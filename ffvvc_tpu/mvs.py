"""Motion vector derivation (H.266 clause 8.5.2).

Reference analogue: /root/reference/libavcodec/vvc/vvc_mvs.c — spatial merge
candidates :638, temporal :678, HMVP :694, pairwise :713, zero :752, AMVP
:1405-1570, TMVP scaling :71-110, MV storage :251-537, HMVP update :1762.

MV fields are stored in dense per-4x4 grids on FrameTabs (the reference's
fc->tab.mvf plane-of-arrays) — the tensor layout the TPU inter stage
consumes directly.
"""
from __future__ import annotations

import numpy as np

# PredFlag (reference vvc_ctu.h)
PF_INTRA, PF_L0, PF_L1, PF_BI = 0, 1, 2, 3
L0, L1 = 0, 1
MAX_NUM_HMVP_CANDS = 5


def clip(v, lo, hi):
    return lo if v < lo else (hi if v > hi else v)


class MvField:
    """One 4x4 motion field entry (reference MvField, vvc_ctu.h)."""
    __slots__ = ("pred_flag", "mv", "ref_idx", "bcw_idx", "hpel_if_idx",
                 "ciip_flag")

    def __init__(self):
        self.pred_flag = PF_INTRA
        self.mv = [[0, 0], [0, 0]]
        self.ref_idx = [0, 0]
        self.bcw_idx = 0
        self.hpel_if_idx = 0
        self.ciip_flag = 0

    def copy(self):
        o = MvField()
        o.pred_flag = self.pred_flag
        o.mv = [list(self.mv[0]), list(self.mv[1])]
        o.ref_idx = list(self.ref_idx)
        o.bcw_idx = self.bcw_idx
        o.hpel_if_idx = self.hpel_if_idx
        o.ciip_flag = self.ciip_flag
        return o


def same_mv_ref(n: MvField, o) -> bool:
    """compare_mv_ref_idx (vvc_mvs.c:40)."""
    if o is None or n.pred_flag != o.pred_flag:
        return False
    for i in range(2):
        if n.pred_flag & (i + 1):
            if n.ref_idx[i] != o.ref_idx[i] or n.mv[i] != o.mv[i]:
                return False
    return True


def round_mv(mv, lshift, rshift):
    """ff_vvc_round_mv (vvc_mvs.c:1745)."""
    if rshift:
        off = 1 << (rshift - 1)
        mv[0] = ((mv[0] + off - (mv[0] >= 0)) >> rshift) * (1 << lshift)
        mv[1] = ((mv[1] + off - (mv[1] >= 0)) >> rshift) * (1 << lshift)
    else:
        mv[0] *= 1 << lshift
        mv[1] *= 1 << lshift


def clip_mv(mv):
    mv[0] = clip(mv[0], -(1 << 17), (1 << 17) - 1)
    mv[1] = clip(mv[1], -(1 << 17), (1 << 17) - 1)


def mv_scale(src, td, tb):
    """ff_vvc_mv_scale (vvc_mvs.c:71)."""
    td = clip(td, -128, 127)
    tb = clip(tb, -128, 127)
    tx = (0x4000 + (abs(td) >> 1)) // td if td > 0 else \
        -((0x4000 + (abs(td) >> 1)) // -td)  # C truncating division
    scale = clip((tb * tx + 32) >> 6, -(1 << 11), (1 << 11) - 1)
    out = [0, 0]
    for i in range(2):
        p = scale * src[i]
        out[i] = clip((p + 127 + (p < 0)) >> 8, -(1 << 17), (1 << 17) - 1)
    return out


def mv_compression(mv):
    """8.5.2.15 temporal motion buffer compression (vvc_mvs.c:58)."""
    for i in range(2):
        v = mv[i]
        s = v >> 17
        f = max(((v ^ s) | 31).bit_length() - 1, 0) - 4
        mask = (-1 * (1 << f)) >> 1
        rnd = (1 << f) >> 2
        mv[i] = (v + rnd) & mask


class MotionContext:
    """Per-slice motion derivation state: RPL + neighbour availability come
    from the CtuCoder; HMVP lives on the entry point (coder)."""

    def __init__(self, coder):
        self.c = coder          # CtuCoder: sps/pps/sh/tabs/na flags
        self.ph = coder.sh.ph   # raw picture header
        self.tabs = coder.tabs
        self.sps = coder.sps
        self.pps = coder.pps

    # --- mvf grid access ---------------------------------------------------

    def get_mvf(self, x, y) -> MvField:
        t = self.tabs
        xi, yi = x >> 2, y >> 2
        f = MvField()
        f.pred_flag = int(t.mvf_pf[yi, xi])
        f.mv = [[int(t.mvf_mv[0, yi, xi, 0]), int(t.mvf_mv[0, yi, xi, 1])],
                [int(t.mvf_mv[1, yi, xi, 0]), int(t.mvf_mv[1, yi, xi, 1])]]
        f.ref_idx = [int(t.mvf_ref[0, yi, xi]), int(t.mvf_ref[1, yi, xi])]
        f.bcw_idx = int(t.mvf_bcw[yi, xi])
        f.hpel_if_idx = int(t.mvf_hpel[yi, xi])
        f.ciip_flag = int(t.mvf_ciip[yi, xi])
        return f

    def set_mvf(self, x0, y0, w, h, f: MvField):
        t = self.tabs
        x1, y1 = (x0 + w) >> 2, (y0 + h) >> 2
        x0, y0 = x0 >> 2, y0 >> 2
        t.mvf_pf[y0:y1, x0:x1] = f.pred_flag
        for i in range(2):
            t.mvf_mv[i, y0:y1, x0:x1, 0] = f.mv[i][0]
            t.mvf_mv[i, y0:y1, x0:x1, 1] = f.mv[i][1]
            t.mvf_ref[i, y0:y1, x0:x1] = f.ref_idx[i]
        t.mvf_bcw[y0:y1, x0:x1] = f.bcw_idx
        t.mvf_hpel[y0:y1, x0:x1] = f.hpel_if_idx
        t.mvf_ciip[y0:y1, x0:x1] = f.ciip_flag

    def set_intra_mvf(self, x0, y0, w, h):
        t = self.tabs
        x1, y1 = (x0 + w) >> 2, (y0 + h) >> 2
        t.mvf_pf[y0 >> 2:y1, x0 >> 2:x1] = PF_INTRA

    # --- neighbour machinery (vvc_mvs.c:519-615) ---------------------------

    A0, A1, A2, B0, B1, B2, B3 = range(7)

    def _neighbours(self, cu):
        x0, y0, w, h = cu.x0, cu.y0, cu.cb_width, cu.cb_height
        na = self.c.na
        a0_avail = self._is_a0_available(cu)
        return [
            (x0 - 1, y0 + h, not a0_avail),          # A0
            (x0 - 1, y0 + h - 1, not na.cand_left),  # A1
            (x0 - 1, y0, not na.cand_left),          # A2
            (x0 + w, y0 - 1, not na.cand_up_right),  # B0
            (x0 + w - 1, y0 - 1, not na.cand_up),    # B1
            (x0 - 1, y0 - 1, not na.cand_up_left),   # B2
            (x0, y0 - 1, not na.cand_up),            # B3
        ]

    def _is_available(self, x, y):
        # reference samples fc->tab.cb_width[0] on the min-CB grid
        # (vvc_mvs.c:544); our grid is 4x4 with values replicated per CU
        return int(self.tabs.cb_width[0][y >> 2, x >> 2]) != 0

    def _is_a0_available(self, cu):
        sps = self.sps
        x0b = cu.x0 & ((1 << sps.ctb_log2_size_y) - 1)
        if not x0b and not self.c.ctb_left_flag:
            return False
        max_y = min(self.pps.height,
                    ((cu.y0 >> sps.ctb_log2_size_y) + 1) << sps.ctb_log2_size_y)
        if cu.y0 + cu.cb_height >= max_y:
            return False
        return self._is_available(cu.x0 - 1, cu.y0 + cu.cb_height)

    def _check_available(self, cu, nb, is_mvp):
        x, y, excluded = nb
        if excluded:
            return False
        sps = self.sps
        if sps.r.sps_entropy_coding_sync_enabled_flag and \
                (x >> sps.ctb_log2_size_y) > (cu.x0 >> sps.ctb_log2_size_y):
            return False
        if not self._is_available(x, y):
            return False
        if int(self.tabs.mvf_pf[y >> 2, x >> 2]) == PF_INTRA:
            return False
        if not is_mvp and self._is_same_mer(x, y, cu.x0, cu.y0):
            return False
        return True

    def _is_same_mer(self, xn, yn, xp, yp):
        pl = self.sps.log2_parallel_merge_level
        return (xn >> pl) == (xp >> pl) and (yn >> pl) == (yp >> pl)

    # --- temporal (TMVP) ---------------------------------------------------

    def no_backward_pred_flag(self):
        rpl = self.c.rpl
        poc = self.c.poc
        for lst in rpl:
            for p in lst.poc_list:
                if p > poc:
                    return 0
        return 1

    def _check_mvset(self, mv_col_in, col_poc, lx_col, ref_idx_col,
                     rpl_col, x_lx, ref_idx_lx):
        """check_mvset (vvc_mvs.c:88): returns scaled MV or None."""
        rpl = self.c.rpl
        cur_lt = rpl[x_lx].is_lt[ref_idx_lx]
        col_lt = rpl_col[lx_col].is_lt[ref_idx_col]
        if cur_lt != col_lt:
            return None
        col_poc_diff = col_poc - rpl_col[lx_col].poc_list[ref_idx_col]
        cur_poc_diff = self.c.poc - rpl[x_lx].poc_list[ref_idx_lx]
        mv_col = list(mv_col_in)
        mv_compression(mv_col)
        if cur_lt or col_poc_diff == cur_poc_diff:
            return [clip(mv_col[0], -(1 << 17), (1 << 17) - 1),
                    clip(mv_col[1], -(1 << 17), (1 << 17) - 1)]
        return mv_scale(mv_col, col_poc_diff, cur_poc_diff)

    def _derive_temporal_col(self, temp_col, ref_idx_lx, x_lx, rpl_col,
                             sb_flag):
        """derive_temporal_colocated_mvs (vvc_mvs.c:140)."""
        pf = temp_col.pred_flag
        if pf == PF_INTRA:
            return None

        def check(l):
            return self._check_mvset(temp_col.mv[l], self.col_poc, l,
                                     temp_col.ref_idx[l], rpl_col,
                                     x_lx, ref_idx_lx)
        if sb_flag:
            if x_lx == 0:
                if pf & PF_L0:
                    return check(0)
                if self.no_backward_pred_flag() and (pf & PF_L1):
                    return check(1)
            else:
                if pf & PF_L1:
                    return check(1)
                if self.no_backward_pred_flag() and (pf & PF_L0):
                    return check(0)
            return None
        if not (pf & PF_L0):
            return check(1)
        if pf == PF_L0:
            return check(0)
        # PF_BI
        if self.no_backward_pred_flag():
            return check(0) if x_lx == 0 else check(1)
        return check(0) if not self.c.sh.r.sh_collocated_from_l0_flag \
            else check(1)

    def temporal_luma_mv(self, cu, ref_idx_lx, x_lx, check_center, sb_flag):
        """temporal_luma_motion_vector (vvc_mvs.c:200) -> mv or None."""
        col = self.c.collocated_ref
        if col is None:
            return None
        if not self.ph.ph_temporal_mvp_enabled_flag or \
                (cu.cb_width * cu.cb_height <= 32):
            return None
        self.col_poc = col.poc
        ctb_log2 = self.sps.ctb_log2_size_y
        x = cu.x0 + cu.cb_width
        y = cu.y0 + cu.cb_height
        mv = None
        if (cu.y0 >> ctb_log2) == (y >> ctb_log2) and \
                y < self.sps.height and x < self.sps.width:
            xa, ya = x & ~7, y & ~7
            temp_col = col.get_mvf(xa, ya)
            rpl_col = col.rpl_at(xa, ya)
            mv = self._derive_temporal_col(temp_col, ref_idx_lx, x_lx,
                                           rpl_col, sb_flag)
        if check_center and mv is None:
            xa = (cu.x0 + (cu.cb_width >> 1)) & ~7
            ya = (cu.y0 + (cu.cb_height >> 1)) & ~7
            temp_col = col.get_mvf(xa, ya)
            rpl_col = col.rpl_at(xa, ya)
            mv = self._derive_temporal_col(temp_col, ref_idx_lx, x_lx,
                                           rpl_col, sb_flag)
        return mv

    # --- merge mode (vvc_mvs.c:638-817) ------------------------------------

    def _merge_spatial(self, cu, merge_idx, nb_list, cand_list):
        nbs = self._neighbours(cu)
        seq = [(self.B1, None), (self.A1, self.B1), (self.B0, self.B1),
               (self.A0, self.A1)]
        for nb, old in seq:
            cand = None
            if self._check_available(cu, nbs[nb], is_mvp=False):
                cand = self.get_mvf(nbs[nb][0], nbs[nb][1])
            nb_list[nb] = cand
            if cand is not None and not same_mv_ref(cand, nb_list.get(old)):
                cand_list.append(cand)
                if merge_idx == len(cand_list) - 1:
                    return True
        if len(cand_list) != 4:
            if self._check_available(cu, nbs[self.B2], is_mvp=False):
                cand = self.get_mvf(nbs[self.B2][0], nbs[self.B2][1])
                if not same_mv_ref(cand, nb_list.get(self.A1)) and \
                        not same_mv_ref(cand, nb_list.get(self.B1)):
                    cand_list.append(cand)
                    if merge_idx == len(cand_list) - 1:
                        return True
        return False

    def _merge_temporal(self, cu):
        cand = MvField()
        if self.ph.ph_temporal_mvp_enabled_flag and \
                cu.cb_width * cu.cb_height > 32:
            mv0 = self.temporal_luma_mv(cu, 0, 0, 1, 0)
            mv1 = self.temporal_luma_mv(cu, 0, 1, 1, 0) \
                if self.c.sh.is_b else None
            pf = (mv0 is not None) + ((mv1 is not None) << 1)
            cand.pred_flag = pf
            if mv0 is not None:
                cand.mv[0] = mv0
            if mv1 is not None:
                cand.mv[1] = mv1
        return cand if cand.pred_flag else None

    def _merge_history(self, merge_idx, nb_list, cand_list):
        hmvp = self.c.hmvp
        max_cand = self.sps.max_num_merge_cand
        i = 1
        while i <= len(hmvp) and len(cand_list) < max_cand - 1:
            h = hmvp[len(hmvp) - i]
            same = i <= 2 and (same_mv_ref(h, nb_list.get(self.A1)) or
                               same_mv_ref(h, nb_list.get(self.B1)))
            if not same:
                cand_list.append(h.copy())
                if merge_idx == len(cand_list) - 1:
                    return True
            i += 1
        return False

    def _merge_pairwise(self, cand_list, is_b):
        if len(cand_list) <= 1:
            return False
        p0, p1 = cand_list[0], cand_list[1]
        cand = MvField()
        for i in range(2 if is_b else 1):
            mask = i + 1
            if p0.pred_flag & mask:
                cand.pred_flag |= mask
                cand.ref_idx[i] = p0.ref_idx[i]
                if p1.pred_flag & mask:
                    mv = [p0.mv[i][0] + p1.mv[i][0],
                          p0.mv[i][1] + p1.mv[i][1]]
                    round_mv(mv, 0, 1)
                    cand.mv[i] = mv
                else:
                    cand.mv[i] = list(p0.mv[i])
            elif p1.pred_flag & mask:
                cand.pred_flag |= mask
                cand.mv[i] = list(p1.mv[i])
                cand.ref_idx[i] = p1.ref_idx[i]
        if cand.pred_flag:
            cand.hpel_if_idx = p0.hpel_if_idx \
                if p0.hpel_if_idx == p1.hpel_if_idx else 0
            cand_list.append(cand)
            return True
        return False

    def _merge_zero(self, merge_idx, cand_list):
        rsh = self.c.sh.r
        is_b = self.c.sh.is_b
        if self.c.sh.is_p:
            num_ref = rsh.num_ref_idx_active[L0]
        else:
            num_ref = min(rsh.num_ref_idx_active[L0],
                          rsh.num_ref_idx_active[L1])
        zero_idx = 0
        while len(cand_list) < self.sps.max_num_merge_cand:
            cand = MvField()
            cand.pred_flag = PF_L0 + (is_b << 1)
            ri = zero_idx if zero_idx < num_ref else 0
            cand.ref_idx = [ri, ri]
            cand_list.append(cand)
            if merge_idx == len(cand_list) - 1:
                return
            zero_idx += 1

    def mv_merge_mode(self, cu, merge_idx):
        """mv_merge_mode (vvc_mvs.c:785): candidate list valid through
        merge_idx; returns the list."""
        cand_list = []
        nb_list = {}
        if self._merge_spatial(cu, merge_idx, nb_list, cand_list):
            return cand_list
        tc = self._merge_temporal(cu)
        if tc is not None:
            cand_list.append(tc)
            if merge_idx == len(cand_list) - 1:
                return cand_list
        if self._merge_history(merge_idx, nb_list, cand_list):
            return cand_list
        if self._merge_pairwise(cand_list, self.c.sh.is_b):
            if merge_idx == len(cand_list) - 1:
                return cand_list
        self._merge_zero(merge_idx, cand_list)
        return cand_list

    def luma_mv_merge_mode(self, cu, merge_idx, ciip_flag) -> MvField:
        """ff_vvc_luma_mv_merge_mode (vvc_mvs.c:806)."""
        self.c.set_neighbour_available(cu.x0, cu.y0, cu.cb_width,
                                       cu.cb_height)
        mv = self.mv_merge_mode(cu, merge_idx)[merge_idx].copy()
        mv.ciip_flag = ciip_flag
        return mv

    def luma_mv_merge_gpm(self, cu, merge_gpm_idx):
        """ff_vvc_luma_mv_merge_gpm (vvc_mvs.c:818)."""
        self.c.set_neighbour_available(cu.x0, cu.y0, cu.cb_width,
                                       cu.cb_height)
        idx = [merge_gpm_idx[0],
               merge_gpm_idx[1] + (merge_gpm_idx[1] >= merge_gpm_idx[0])]
        cand_list = self.mv_merge_mode(cu, max(idx[0], idx[1]))
        out = []
        for i in range(2):
            lx = idx[i] & 1
            mask = lx + PF_L0
            cand = cand_list[idx[i]]
            if not (cand.pred_flag & mask):
                lx = 1 - lx
                mask = lx + PF_L0
            f = MvField()
            f.pred_flag = mask
            f.ref_idx[lx] = cand.ref_idx[lx]
            f.mv[lx] = list(cand.mv[lx])
            out.append(f)
        return out

    # --- AMVP (vvc_mvs.c:1405-1598) ----------------------------------------

    def _mvp_candidate(self, x, y, lx, ref_idx):
        rpl = self.c.rpl
        f = self.get_mvf(x, y)
        poc = rpl[lx].poc_list[ref_idx[lx]]
        if (f.pred_flag & (lx + 1)) and \
                rpl[lx].poc_list[f.ref_idx[lx]] == poc:
            return list(f.mv[lx])
        ly = 1 - lx
        if (f.pred_flag & (ly + 1)) and \
                rpl[ly].poc_list[f.ref_idx[ly]] == poc:
            return list(f.mv[ly])
        return None

    def _mvp_from_nbs(self, cu, nbs, idxs, lx, ref_idx, amvr_shift):
        for nb in idxs:
            if self._check_available(cu, nbs[nb], is_mvp=True):
                mv = self._mvp_candidate(nbs[nb][0], nbs[nb][1], lx, ref_idx)
                if mv is not None:
                    round_mv(mv, amvr_shift, amvr_shift)
                    return mv
        return None

    def _mvp_history(self, mvp_lx_flag, lx, ref_idx_val, amvr_shift,
                     num_cands):
        hmvp = self.c.hmvp
        rpl = self.c.rpl
        poc = rpl[lx].poc_list[ref_idx_val]
        if not hmvp:
            return None
        for i in range(1, min(4, len(hmvp)) + 1):
            h = hmvp[i - 1]
            for j in range(2):
                ly = (1 - lx) if j else lx
                if (h.pred_flag & (PF_L0 + ly)) and \
                        poc == rpl[ly].poc_list[h.ref_idx[ly]]:
                    if mvp_lx_flag == num_cands:
                        mv = list(h.mv[ly])
                        round_mv(mv, amvr_shift, amvr_shift)
                        return mv
                    num_cands += 1
        return None

    def mvp(self, cu, mvp_lx_flag, lx, ref_idx, amvr_shift):
        """mvp (vvc_mvs.c:1569) -> [x, y]."""
        nbs = self._neighbours(cu)
        num_cands = 0
        mv_a = None
        mv = self._mvp_from_nbs(cu, nbs, (self.A0, self.A1), lx, ref_idx,
                                amvr_shift)
        if mv is not None:
            if mvp_lx_flag == num_cands:
                return mv
            num_cands += 1
            mv_a = mv
        mv = self._mvp_from_nbs(cu, nbs, (self.B0, self.B1, self.B2), lx,
                                ref_idx, amvr_shift)
        if mv is not None and (mv_a is None or mv_a != mv):
            if mvp_lx_flag == num_cands:
                return mv
            num_cands += 1
        tmv = self.temporal_luma_mv(cu, ref_idx[lx], lx, 1, 0)
        if tmv is not None:
            if mvp_lx_flag == num_cands:
                round_mv(tmv, amvr_shift, amvr_shift)
                return tmv
            num_cands += 1
        hmv = self._mvp_history(mvp_lx_flag, lx, ref_idx[lx], amvr_shift,
                                num_cands)
        if hmv is not None:
            return hmv
        return [0, 0]

    def ff_mvp(self, cu, mvp_lx_flag, amvr_shift, mi):
        """ff_vvc_mvp (vvc_mvs.c:1588)."""
        mi.num_sb_x = mi.num_sb_y = 1
        self.c.set_neighbour_available(cu.x0, cu.y0, cu.cb_width,
                                       cu.cb_height)
        if mi.pred_flag != PF_L1:
            mi.mv[L0][0] = self.mvp(cu, mvp_lx_flag[L0], L0, mi.ref_idx,
                                    amvr_shift)
        if mi.pred_flag != PF_L0:
            mi.mv[L1][0] = self.mvp(cu, mvp_lx_flag[L1], L1, mi.ref_idx,
                                    amvr_shift)

    # --- HMVP update (vvc_mvs.c:1762) --------------------------------------

    def update_hmvp(self, cu):
        pl = self.sps.log2_parallel_merge_level
        x_br, y_br = cu.x0 + cu.cb_width, cu.y0 + cu.cb_height
        if not ((x_br >> pl) > (cu.x0 >> pl) and
                (y_br >> pl) > (cu.y0 >> pl)):
            return
        mvf = self.get_mvf(cu.x0, cu.y0)
        hmvp = self.c.hmvp
        for i, h in enumerate(hmvp):
            if same_mv_ref(mvf, h):
                del hmvp[i]
                break
        else:
            if len(hmvp) == MAX_NUM_HMVP_CANDS:
                del hmvp[0]
        hmvp.append(mvf)


def mv_merge_refine_pred_flag(mvf: MvField, width, height):
    """mv_merge_refine_pred_flag (vvc_ctu.c:1308)."""
    if mvf.pred_flag == PF_BI and width + height == 12:
        mvf.pred_flag = PF_L0
        mvf.bcw_idx = 0
