"""Top-level decoder orchestration.

Reference analogue: /root/reference/libavcodec/vvc/vvcdec.c (decode_nal_units
:759, decode_slice :693, frame_setup :679, slice_init_entry_points :453).

This is the host-side front-end driver: NAL dispatch, parameter-set
activation, per-slice entry-point CABAC parsing into FrameTabs tensors, and
(currently) the golden scalar reconstruction.  The TPU pixel path consumes
the same FrameTabs.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .bitstream import split_annexb, BitReader, NalType, is_vcl, is_idr, is_rap
from .bitstream.h266 import (H266ParamSets, read_sps, read_pps, read_aps,
                             read_vps, read_picture_header, read_slice_header,
                             read_sei, SLICE_I)
from . import ps as derived
from .cabac.engine import CabacDecoder, make_states
from .ctu import CtuCoder, FrameTabs
from .recon import FrameBuffer, Reconstructor
from .config import DecoderConfig


@dataclasses.dataclass
class DecodedFrame:
    poc: int
    buffer: FrameBuffer
    tabs: FrameTabs

    def to_yuv_bytes(self):
        return self.buffer.to_yuv_bytes()


class VVCDecoder:
    """VVC decoder: Annex-B bytes in, decoded frames out (decode order for
    all-intra; POC reorder arrives with the inter/DPB milestone)."""

    def __init__(self, config: DecoderConfig = None):
        self.config = config or DecoderConfig()
        self.ps = H266ParamSets()
        self.sps = None
        self.pps = None
        self.ph = None
        self.prev_poc = 0
        self.frames = []

    def decode(self, data: bytes):
        nals = split_annexb(data)
        # group into access units by PH/first-slice boundaries
        frame_nals = []
        out = []
        cur_slices = []
        cur_ph = None

        def flush_frame():
            nonlocal cur_slices, cur_ph
            if cur_slices:
                out.append(self._decode_frame(cur_ph, cur_slices))
            cur_slices = []
            cur_ph = None

        for nal in nals:
            t = nal.nal_unit_type
            r = BitReader(nal.rbsp)
            if t == NalType.SPS:
                self.ps.store_sps(read_sps(r, nal.nuh_layer_id))
            elif t == NalType.PPS:
                self.ps.store_pps(read_pps(r, self.ps))
            elif t in (NalType.PREFIX_APS, NalType.SUFFIX_APS):
                self.ps.store_aps(read_aps(r))
            elif t == NalType.VPS:
                vps = read_vps(r)
                self.ps.vps[vps.vps_video_parameter_set_id] = vps
            elif t == NalType.PH:
                flush_frame()
                self.ps.ph = read_picture_header(r, self.ps)
            elif is_vcl(t):
                sh = read_slice_header(r, self.ps, t)
                first = sh.sh_picture_header_in_slice_header_flag or \
                    (cur_ph is not None and sh.ph is not cur_ph) or \
                    (not cur_slices and cur_ph is None)
                if sh.sh_picture_header_in_slice_header_flag and cur_slices:
                    flush_frame()
                cur_ph = sh.ph
                cur_slices.append((nal, sh, r.pos))
            elif t in (NalType.PREFIX_SEI, NalType.SUFFIX_SEI):
                try:
                    self.last_sei = read_sei(r, t == NalType.PREFIX_SEI)
                except Exception:
                    self.last_sei = []
            # AUD/EOS/EOB/FD/OPI/DCI: no decoder state
        flush_frame()
        return out

    def _decode_frame(self, ph, slices):
        nal0, sh0, _ = slices[0]
        pps_r = self.ps.pps[ph.ph_pic_parameter_set_id]
        sps_r = self.ps.sps[pps_r.pps_seq_parameter_set_id]
        sps = derived.SPS(sps_r)
        pps = derived.PPS(pps_r, sps)
        self.sps, self.pps = sps, pps
        is_clvss = is_rap(nal0.nal_unit_type)  # simplified CLVSS decision
        poc = derived.compute_poc(sps, ph, self.prev_poc, is_clvss and
                                  not ph.ph_poc_msb_cycle_present_flag)
        if is_idr(nal0.nal_unit_type):
            poc = derived.compute_poc(sps, ph, 0, True)
        self.prev_poc = poc
        tabs = FrameTabs(sps, pps)
        fb = FrameBuffer(sps, pps)

        recon_jobs = []
        for slice_idx_in_frame, (nal, sh_r, sh_end_bits) in enumerate(slices):
            sh = derived.SH(sh_r, ph, sps, pps)
            recon_jobs.extend(self._parse_slice(nal, sh, sh_end_bits, tabs, fb,
                                                slice_idx_in_frame))
        if self.config.backend == "tpu":
            # batched inverse transforms on device (one launch per TB bucket);
            # host recon below then only adds the precomputed residuals
            from .ops.itx import frame_device_residuals
            frame_device_residuals(recon_jobs, tabs, sps.bit_depth)
        for rec, ctus in recon_jobs:
            for rs, rx, ry in ctus:
                rec.reconstruct_ctu(rs, rx, ry)
        # in-loop filters (whole-frame passes per spec 8.8)
        from .deblock import Deblocker
        Deblocker(sps, pps, tabs, fb).deblock_frame()
        return DecodedFrame(poc=poc, buffer=fb, tabs=tabs)

    def _entry_point_offsets(self, nal, sh_r, sh_end_bits):
        """Byte ranges of each entry point within nal.rbsp (EPB-adjusted;
        reference vvcdec.c:434-490)."""
        start = sh_end_bits // 8
        n_eps = sh_r.num_entry_points + 1
        if n_eps == 1:
            return [(start, len(nal.rbsp))]
        # offsets are in pre-EPB-removal (coded) bytes; each skipped-byte
        # position recorded by remove_epb shortens the rbsp advance by one
        # (reference vvcdec.c:434-445)
        skipped = nal.skipped
        ranges = []
        pos = start
        for i in range(sh_r.num_entry_points):
            off = sh_r.sh_entry_point_offset_minus1[i] + 1
            nskip = sum(1 for s in skipped if pos < s <= pos + off)
            nxt = pos + off - nskip
            ranges.append((pos, nxt))
            pos = nxt
        ranges.append((pos, len(nal.rbsp)))
        return ranges

    def _parse_slice(self, nal, sh, sh_end_bits, tabs, fb, slice_idx):
        """CABAC-parse one slice; returns recon jobs [(Reconstructor,
        [(rs, rx, ry), ...])] to run after the (optional) device itx pass."""
        sps, pps = self.sps, self.pps
        eps = self._entry_point_offsets(nal, sh.r, sh_end_bits)
        ctu_addrs = sh.ctu_addrs
        ctu_index = {rs: i for i, rs in enumerate(ctu_addrs)}
        # partition CTUs across entry points (tiles / WPP rows)
        ep_ctus = self._partition_ctus(ctu_addrs, len(eps))
        jobs = []
        for ep_idx, (ep_range, ctus) in enumerate(zip(eps, ep_ctus)):
            engine = CabacDecoder(nal.rbsp, ep_range[0] * 8)
            coder = CtuCoder(engine, sps, pps, sh, tabs)
            self._set_alf_counts(coder, sh)
            engine.set_states(None)
            rec = Reconstructor(sps, pps, tabs, fb, coder)
            rec.ph_r = sh.ph
            rec.dep_quant = sh.r.sh_dep_quant_used_flag
            job_ctus = []
            for i, rs in enumerate(ctus):
                rx = rs % pps.ctb_width
                ry = rs // pps.ctb_width
                ctu_idx = ctu_index[rs]  # index within slice
                # CABAC (re)init at slice/tile starts
                first_in_tile = rx == pps.ctb_to_col_bd[rx] and \
                    ry == pps.ctb_to_row_bd[ry]
                if ctu_idx == 0 or first_in_tile:
                    if len(eps) == 1 and ctu_idx != 0:
                        # re-align to byte boundary within same entry point
                        engine2 = CabacDecoder(
                            nal.rbsp, engine.byte_pos_after_terminate() * 8)
                        engine = engine2
                        coder.e = engine
                    qp = max(0, min(63, sh.slice_qp_y))
                    engine.set_states(make_states(qp, sh.cabac_init_type))
                    coder.init_stat_coeff()
                coder.coding_tree_unit(ctu_idx, rs, rx, ry, len(ctu_addrs),
                                       slice_idx)
                job_ctus.append((rs, rx, ry))
            jobs.append((rec, job_ctus))
        return jobs

    def _partition_ctus(self, ctu_addrs, n_eps):
        """Split a slice's CTUs into entry-point groups (tiles or WPP rows)."""
        if n_eps == 1:
            return [ctu_addrs]
        pps = self.pps
        sps = self.sps
        groups = [[]]
        prev = None
        for rs in ctu_addrs:
            rx = rs % pps.ctb_width
            ry = rs // pps.ctb_width
            if prev is not None:
                new_tile = (rx == pps.ctb_to_col_bd[rx] and
                            ry == pps.ctb_to_row_bd[ry] and
                            (pps.ctb_to_col_bd[rx] != pps.ctb_to_col_bd[prev % pps.ctb_width] or
                             pps.ctb_to_row_bd[ry] != pps.ctb_to_row_bd[prev // pps.ctb_width]))
                new_wpp_row = sps.r.sps_entropy_coding_sync_enabled_flag and \
                    ry != prev // pps.ctb_width
                if new_tile or new_wpp_row:
                    groups.append([])
            groups[-1].append(rs)
            prev = rs
        assert len(groups) == n_eps, (len(groups), n_eps)
        return groups

    def _set_alf_counts(self, coder, sh):
        ps = self.ps
        r = sh.r
        if r.sh_alf_enabled_flag and (r.sh_alf_cb_enabled_flag or
                                      r.sh_alf_cr_enabled_flag):
            aps = ps.aps_alf.get(r.sh_alf_aps_id_chroma)
            if aps is not None:
                coder.num_chroma_alt_filters = \
                    aps.alf_chroma_num_alt_filters_minus1 + 1
        ncc = [0, 0]
        if r.sh_alf_cc_cb_enabled_flag:
            aps = ps.aps_alf.get(r.sh_alf_cc_cb_aps_id)
            if aps is not None:
                ncc[0] = aps.alf_cc_cb_filters_signalled_minus1 + 1
        if r.sh_alf_cc_cr_enabled_flag:
            aps = ps.aps_alf.get(r.sh_alf_cc_cr_aps_id)
            if aps is not None:
                ncc[1] = aps.alf_cc_cr_filters_signalled_minus1 + 1
        coder.num_cc_filters = tuple(ncc)
