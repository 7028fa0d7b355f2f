"""DSV2 v2.8 encoder session.

Host: GOP state machine, rate control, packetization, motion/metadata
serialization, native entropy scan. Device: intra analysis reductions,
forward/inverse subband transform, adaptive quantization, motion search
metrics, prediction/residual math.
(ref: src/dsv_encoder.c)
"""
import os

import numpy as np

from .. import native
from ..bitstream import BitWriter
from ..core import constants as K
from ..core import intmath as im
from ..core.frame import Frame, plane_dims, coef_dims, ds2x_luma, B
from ..ops import sbt, hzcc, blockanalysis
from ..utils import packet
from ..utils.packet import VideoMeta
from . import plane as planecode
from . import motion, rc
from . import devsteps
from .decoder import (_PCfg, apply_intra_filter, apply_inloop_filters,
                      compute_filter_q)


class Params:
    """Per-frame coding parameters (ref: DSV_PARAMS, src/dsv.h:242-268)."""

    def __init__(self, meta, effort, do_psy):
        self.meta = meta
        self.effort = effort
        self.do_psy = do_psy
        self.is_ref = 0
        self.has_ref = 0
        self.blk_w = self.blk_h = 16
        self.nbh = self.nbv = 0
        self.temporal_mc = 0
        self.lossless = False

    @property
    def psyf_all(self):
        return hzcc.spatial_psy_factor(self, -1)

    # duck-typed fields for hzcc.spatial_psy_factor
    @property
    def vid_w(self):
        return self.meta.width

    @property
    def vid_h(self):
        return self.meta.height


class EncData:
    """Per-frame bundle (ref: DSV_ENCDATA, src/dsv_encoder.h:49-66)."""

    def __init__(self, fnum, padded):
        self.fnum = fnum
        self.padded = padded          # bordered+extended source Frame
        self._pyramid = []
        self._pyramid_fn = None       # lazy builder (intra batches never
                                      # search motion, but CRF dark-boost
                                      # still reads the smallest level)
        self.residual = None          # becomes the reconstruction
        self.params = None
        self.quant = 0
        self.refdata = None
        self.final_mvs = None
        self.dev = None               # device-resident twins: padded/pyr
                                      # (input prep) + recon/rpyr (chain)

    @property
    def pyramid(self):
        if self._pyramid_fn is not None:
            self._pyramid = self._pyramid_fn()
            self._pyramid_fn = None
        return self._pyramid

    @pyramid.setter
    def pyramid(self, v):
        self._pyramid = v
        self._pyramid_fn = None


class Stats:
    def __init__(self):
        z = ("inum pnum iqual pqual isize psize mb mbI mbP mbdc mbsub eprm "
             "skip fpx hpx qpx fpy hpy qpy ifnum pfnum").split()
        for n in z:
            setattr(self, n, 0)
        self.mbsubs = [0, 0, 0, 0]
        self.iminq = self.pminq = self.imins = self.pmins = 2**31 - 1
        self.imaxq = self.pmaxq = self.imaxs = self.pmaxs = 0


class Encoder:
    """(ref: DSV_ENCODER init at src/dsv_encoder.c:1319-1358)."""

    def __init__(self):
        self.quality = 80 * K.RC_QUAL_SCALE
        self.gop = 48
        self.effort = K.MAX_EFFORT
        self.pyramid_levels = 0
        self.rc_mode = K.RC_CRF
        self.bitrate = 2**31 - 1
        self.rc_pergop = 0
        self.min_q_step = 4
        self.max_q_step = 1
        self.min_quality = self.quality - K.user_qual_to_rc_qual(5)
        self.max_quality = K.RC_QUAL_MAX
        self.min_I_frame_quality = self.quality - K.user_qual_to_rc_qual(2)
        self.prev_I_frame_quality = 0
        self.intra_pct_thresh = 90
        self.stable_refresh = 24
        self.scene_change_pct = 85
        self.do_scd = 1
        self.variable_i_interval = 1
        self.skip_block_thresh = 0
        self.block_size_override_x = -1
        self.block_size_override_y = -1
        self.do_temporal_aq = 1
        self.do_psy = K.PSY_ALL
        self.do_dark_intra_boost = 1
        self.do_intra_filter = 1
        self.do_inter_filter = -1
        self.meta = VideoMeta()
        # state
        self.rc_qual = 0
        self.rf_total = 0
        self.rf_reset = 0
        self.rf_avg = 0
        self.total_P_frame_q = 0
        self.avg_P_frame_q = 0
        self.prev_complexity = -1
        self.curr_complexity = -1
        self.curr_avgmot = 0
        self.curr_intra_pct = 0
        self.curr_scblocks = 0
        self.prev_chaos = -1
        self.motion_chaos = 0
        self.motion_static = 0
        self.avg_err = 0
        self.auto_filter = 0
        self.next_fnum = 0
        self.ref = None               # EncData
        self.prev_link = 0
        self.force_metadata = 0
        self.stability = None         # (nblk, 2) int32
        self.refresh_ctr = 0
        self.blockdata = None         # uint8[nblk]
        self.intra_map = None
        self.prev_gop = -1
        self.prev_quant = 0
        self.stats = Stats()
        self.dev_submit = None        # lockstep batcher hook
        self.hme_backend = None       # None = DSV2_HME env or "host"

    # -- lifecycle ---------------------------------------------------------

    def set_metadata(self, meta: VideoMeta):
        self.meta = meta

    def start(self):
        """(ref: dsv_enc_start, dsv_encoder.c:1360-1383)."""
        self.quality = im.clamp(self.quality, 0, K.RC_QUAL_MAX)
        if self.rc_mode == K.RC_CRF:
            self.rc_qual = im.clamp(self.quality + rc.rc_qual_pct(5),
                                    self.min_I_frame_quality,
                                    self.max_quality)
            self.rf_avg = self.rc_qual
            self.avg_P_frame_q = self.quality
        elif self.rc_mode == K.RC_ABR:
            self.rc_qual = self.quality
            self.avg_P_frame_q = self.quality * 4 // 5
        self.force_metadata = 1

    # -- main entry --------------------------------------------------------

    def encode_frame(self, planes):
        """Encode one frame (y, u, v arrays). Returns a list of packet
        buffers (bytes) with link offsets applied (ref: dsv_enc,
        dsv_encoder.c:1430-1575)."""
        meta = self.meta
        padded = Frame(meta.subsamp, meta.width, meta.height, border=True)
        padded.load(planes)
        padded.extend()
        d = EncData(self.next_fnum, padded)
        self.next_fnum += 1

        from ..utils.trace import stage
        with stage("encode_frame"):
            gop_start, outbuf = self._encode_one(d)
        bufs = []
        if gop_start:
            mbuf = bytearray(packet.encode_metadata(meta))
            bufs.append(self._link(mbuf))
        bufs.append(self._link(bytearray(outbuf)))
        self._tally(d, len(outbuf))
        return [bytes(b) for b in bufs]

    def end_of_stream(self):
        buf = bytearray(packet.encode_eos())
        packet.set_link_offsets(buf, self.prev_link, 0)
        self.prev_link = 0
        return [bytes(buf)]

    def _link(self, buf):
        next_link = len(buf)
        packet.set_link_offsets(buf, self.prev_link, next_link)
        self.prev_link = next_link
        return buf

    # -- per-frame pipeline --------------------------------------------------

    def _setup_params(self, d):
        """(ref: encode_one_frame, dsv_encoder.c:1184-1241)."""
        p = Params(self.meta, self.effort, self.do_psy)
        w, h = self.meta.width, self.meta.height
        p.temporal_mc = K.temporal_mc(d.fnum)
        p.lossless = self.quality == K.RC_QUAL_MAX

        def size4dim(dim):
            return K.MAX_BLOCK_SIZE if dim > 1280 else K.MIN_BLOCK_SIZE

        p.blk_w, p.blk_h = size4dim(w), size4dim(h)
        if abs(w - h) < min(w, h):
            mins = min(p.blk_w, p.blk_h)
            p.blk_w = p.blk_h = mins
        if self.block_size_override_x >= 0:
            p.blk_w = im.clamp(16 << self.block_size_override_x,
                               K.MIN_BLOCK_SIZE, K.MAX_BLOCK_SIZE)
        if self.block_size_override_y >= 0:
            p.blk_h = im.clamp(16 << self.block_size_override_y,
                               K.MIN_BLOCK_SIZE, K.MAX_BLOCK_SIZE)
        p.nbh = im.udiv_round_up(w, p.blk_w)
        p.nbv = im.udiv_round_up(h, p.blk_h)
        d.params = p
        if self.stability is None:
            self.stability = np.zeros((p.nbh * p.nbv, 2), dtype=np.int64)
            self.blockdata = np.zeros(p.nbh * p.nbv, dtype=np.uint8)
        if self.pyramid_levels == 0:
            lvls = im.lb2(min(w, h))
            maxdim = max(p.nbh, p.nbv)
            while (1 << lvls) > maxdim:
                lvls -= 1
            self.pyramid_levels = im.clamp(lvls, 3, K.MAX_PYRAMID_LEVELS)

    def _mk_pyramid(self, frame):
        """(ref: dsv_encoder.c:493-516)."""
        pyr = []
        prev = frame
        w, h = frame.width, frame.height
        for i in range(self.pyramid_levels):
            f = Frame(frame.subsamp, im.round_shift(w, i + 1),
                      im.round_shift(h, i + 1), border=True)
            ds2x_luma(f, prev)
            f.extend(luma_only=True)
            pyr.append(f)
            prev = f
        return pyr

    def _devchain(self):
        """Device-resident reference chain: recon, in-loop filters, border
        extension and ME pyramids never leave the device. Requires an
        on-device motion search (wave or pallas); the host HME backend
        reads the reference pixels on the host."""
        from . import hme
        return hme.is_device_backend(self) and self.gop != K.GOP_INTRA

    def _encode_one(self, d):
        """(ref: encode_one_frame, dsv_encoder.c:1184-1317)."""
        self._setup_params(d)
        p = d.params
        prev_I = self.prev_gop
        if self._devchain():
            # host pyramid only materializes if CRF dark-boost needs it
            d._pyramid_fn = (lambda padded=d.padded:
                             self._mk_pyramid(padded))
            vis = tuple(d.padded.view(c) for c in range(3))
            cfg = (self.meta.width, self.meta.height, self.meta.subsamp,
                   self.pyramid_levels)
            if self.dev_submit is not None:
                d.dev = self.dev_submit(
                    ("input_prep", cfg),
                    lambda c: devsteps.make_input_prep(*c), vis,
                    fetch=False)
            else:
                d.dev = devsteps.make_input_prep(*cfg)(*vis)
        else:
            d.pyramid = self._mk_pyramid(d.padded)

        gop_start = 0
        if self.force_metadata or (self.prev_gop + self.gop) <= d.fnum:
            gop_start = 1
            self.prev_gop = d.fnum
            self.force_metadata = 0

        if self.gop == K.GOP_INTRA:
            p.is_ref = 0
            p.has_ref = 0
        else:
            p.is_ref = 1
            if gop_start:
                p.has_ref = 0
            else:
                p.has_ref = 1
                d.refdata = self.ref
            self.ref = d
        self.avg_err = 0

        forced_intra = 0
        if not p.has_ref:
            if self.intra_map is None:
                self.intra_map = np.zeros(p.nbh * p.nbv, dtype=np.uint8)
        else:
            self._motion_est(d)
            forced_intra = self._scene_change_detection(d)
        if self.variable_i_interval and forced_intra:
            self.prev_gop = d.fnum
        if not p.has_ref:
            if self.intra_map is None:
                self.intra_map = np.zeros(p.nbh * p.nbv, dtype=np.uint8)
            self.intra_map[:] = 0

        d.quant = rc.quality2quant(self, d, prev_I, forced_intra)
        self._compute_auto_filter(d)

        d.residual = d.padded.clone(border=True)
        outbuf = self._encode_picture(d)

        if (p.is_ref and self.gop != K.GOP_INTRA
                and not (d.dev and "recon" in d.dev)):
            d.residual.extend()  # becomes the reconstructed reference
        return gop_start, outbuf

    # -- picture ------------------------------------------------------------

    def _gather_stats(self, d, intramv, stats):
        """(ref: dsv_encoder.c:992-1037)."""
        p = d.params
        nblk = p.nbh * p.nbv
        temp_rc = self.refresh_ctr
        if self.refresh_ctr >= self.stable_refresh:
            temp_rc = 0
        avgdiv = max(temp_rc, 1)
        if not p.has_ref:
            fl = intramv.flags
            if d.fnum > 0 and self.do_temporal_aq:
                stable = ((self.stability[:, 0] // avgdiv == 0)
                          & (self.stability[:, 1] // avgdiv == 0))
            else:
                stable = (fl & (1 << K.MV_BIT_SKIP)) != 0
            maint = int(((fl & (1 << K.MV_BIT_MAINTAIN)) != 0).sum())
            ring = int(((fl & (1 << K.MV_BIT_RINGING)) != 0).sum())
            stats[K.MAINTAIN_STAT] += 2 * maint - nblk
            stats[K.RINGING_STAT] += 2 * ring - nblk
            stats[K.STABLE_STAT] += 2 * int(stable.sum()) - nblk
            return
        fl = d.final_mvs.flags.astype(np.uint32)
        intra = ((fl >> K.MV_BIT_INTRA) & 1).astype(bool)
        skip = ((fl >> K.MV_BIT_SKIP) & 1).astype(bool)
        eprm = ((fl >> K.MV_BIT_EPRM) & 1).astype(bool)
        ns = int((~skip).sum())
        stats[K.MODE_STAT] += 2 * int((intra & ~skip).sum()) - ns
        stats[K.EPRM_STAT] += 2 * int((eprm & ~skip).sum()) - ns
        stats[K.STABLE_STAT] += 2 * int(((~intra) & skip).sum()) - nblk

    def _stable_decisions(self, d, intramv):
        """Stable/skip bits + blockdata init + stability accumulation
        (ref: encode_stable_blocks, dsv_encoder.c:797-883)."""
        p = d.params
        nblk = p.nbh * p.nbv
        if self.refresh_ctr >= self.stable_refresh:
            self.refresh_ctr = 0
            self.stability[:] = 0
        avgdiv = max(self.refresh_ctr, 1)
        fps = im.udiv_round(p.meta.fps_num, p.meta.fps_den)
        if fps <= 24:
            dsf = 6
        elif fps <= 30:
            dsf = 4
        elif fps <= 60:
            dsf = 2
        else:
            dsf = 0
        if not p.has_ref:
            fl = intramv.flags
            if d.fnum > 0 and self.do_temporal_aq:
                stable = ((self.stability[:, 0] // avgdiv == 0)
                          & (self.stability[:, 1] // avgdiv == 0))
            else:
                stable = np.zeros(nblk, dtype=bool)
            stable = stable | ((fl & (1 << K.MV_BIT_SKIP)) != 0)
            self.blockdata[:] = stable.astype(np.uint8) << K.STABLE_BIT
            return stable.astype(np.uint8)
        mf = d.final_mvs
        fl = mf.flags.astype(np.uint32)
        skip = ((fl >> K.MV_BIT_SKIP) & 1).astype(bool)
        intra = ((fl >> K.MV_BIT_INTRA) & 1).astype(bool)
        simc = ((fl >> K.MV_BIT_SIMCMPLX) & 1).astype(np.uint8)
        stable = (~intra) & skip
        acc = (~intra) & (~skip)  # moving inter blocks accumulate motion
        self.stability[:, 0] += np.where(
            acc, np.abs(mf.x.astype(np.int64)) >> dsf, 0)
        self.stability[:, 1] += np.where(
            acc, np.abs(mf.y.astype(np.int64)) >> dsf, 0)
        mf.x[skip] = 0
        mf.y[skip] = 0
        self.blockdata[:] = (np.where(intra, K.IS_INTRA, 0).astype(np.uint8)
                             | (stable.astype(np.uint8) << K.SKIP_BIT)
                             | (simc << K.SIMCMPLX_BIT))
        return stable.astype(np.uint8)

    def _encode_picture(self, d):
        """(ref: encode_picture, dsv_encoder.c:1039-1173)."""
        p = d.params
        meta = self.meta
        w = BitWriter(1 << 16)
        packet.write_packet_hdr(w, K.make_pt(p.is_ref, p.has_ref))
        w.align()
        w.put_bits(32, d.fnum)

        intramv = None
        if not p.has_ref:
            intramv = blockanalysis.intra_analysis(d.padded, p)

        stats = [K.ONE_MARKER] * K.MAX_STAT
        if self.effort >= 7:
            self._gather_stats(d, intramv, stats)
            for i in range(K.MAX_STAT):
                stats[i] = (K.ZERO_MARKER if stats[i] > 0 else K.ONE_MARKER)
        else:
            stats[K.MAINTAIN_STAT] = K.ZERO_MARKER
            stats[K.RINGING_STAT] = K.ZERO_MARKER

        w.align()
        w.put_ueg(im.lb2(p.blk_w) - 4)
        w.put_ueg(im.lb2(p.blk_h) - 4)
        w.align()
        w.put_bit(stats[K.STABLE_STAT])
        if p.has_ref:
            w.put_bit(stats[K.MODE_STAT])
            w.put_bit(stats[K.EPRM_STAT])
            inter_filter = (self.do_inter_filter == 1
                            or (self.do_inter_filter == -1
                                and self.auto_filter))
            w.put_bit(1 if inter_filter else 0)
        else:
            inter_filter = 0
            w.put_bit(stats[K.MAINTAIN_STAT])
            w.put_bit(stats[K.RINGING_STAT])
            w.put_bit(self.do_intra_filter)
        w.put_bits(K.MAX_QP_BITS, d.quant)
        w.put_bit(0)
        w.align()

        stable_bits = self._stable_decisions(d, intramv)
        motion.encode_stable_blocks(w, stable_bits, stats)
        if p.has_ref:
            # prediction/subtraction happen inside the fused device step
            w.align()
            motion.encode_motion(w, d.final_mvs, stats, self.blockdata)
        else:
            fl = intramv.flags
            self.blockdata |= (((fl >> K.MV_BIT_RINGING) & 1)
                               << K.RINGING_BIT).astype(np.uint8)
            self.blockdata |= (((fl >> K.MV_BIT_MAINTAIN) & 1)
                               << K.MAINTAIN_BIT).astype(np.uint8)
            ring_bits = (intramv.flags & (1 << K.MV_BIT_RINGING)) != 0
            maint_bits = (intramv.flags & (1 << K.MV_BIT_MAINTAIN)) != 0
            motion.encode_intra_meta(w, ring_bits, maint_bits, stats)

        # image data — one fused device dispatch for the whole frame
        # (ref: dsv_encoder.c:1134-1161)
        w.align()
        pcfg = _PCfg(meta, p.blk_w, p.blk_h, bool(p.has_ref), p.lossless,
                     do_psy=p.do_psy)
        bd_grid = np.ascontiguousarray(
            self.blockdata.reshape(p.nbv, p.nbh))
        mf = d.final_mvs if p.has_ref else intramv
        eprm_m = np.asarray(mf.grid(mf.bit(K.MV_BIT_EPRM)))
        mlt_m = np.asarray(mf.grid(mf.bit(K.MV_BIT_MAINTAIN)
                                   & (np.abs(mf.x.astype(np.int32)) < 32)
                                   & (np.abs(mf.y.astype(np.int32)) < 32)))
        need_recon = bool(p.is_ref and self.gop != K.GOP_INTRA)
        devchain = self._devchain() and d.dev is not None
        if devchain:
            hc = pcfg.hzcc_cfg(0)
            fq = compute_filter_q(hc, d.quant)
            fthresh = 32 * (14 - im.lb2(fq))
        if p.has_ref:
            cfg = (meta.width, meta.height, meta.subsamp, p.blk_w, p.blk_h,
                   p.lossless, p.do_psy)
            mvargs = (mf.grid(mf.x).astype(np.int32),
                      mf.grid(mf.y).astype(np.int32),
                      mf.grid(mf.flags).astype(np.int32),
                      mf.grid(mf.submask).astype(np.int32),
                      mf.grid(mf.dc).astype(np.int32),
                      bd_grid, eprm_m, mlt_m, np.int32(d.quant),
                      np.int32(p.temporal_mc))
            if devchain:
                cfg = cfg + (self.pyramid_levels, meta.inter_sharpen)
                refs = d.refdata.dev["recon"]
                args = (tuple(d.dev["padded"]), tuple(refs)) + mvargs + (
                    np.int32(fq), np.int32(fthresh),
                    np.int32(1 if inter_filter else 0))
                if self.dev_submit is not None:
                    outs = self.dev_submit(
                        ("p_chain", cfg),
                        lambda c: devsteps.make_p_chain_step(*c), args,
                        post=devsteps.prefetch_step_lanes,
                        fetch=devsteps.step_fetch_spec)
                else:
                    outs = devsteps.make_p_chain_step(*cfg)(*args)
            else:
                srcs = []
                for c in range(3):
                    mcc = pcfg.mc_cfg(c)
                    srcs.append(
                        d.residual.planes[c][B:B + mcc.gh, B:B + mcc.gw])
                refs = [d.refdata.residual.planes[c] for c in range(3)]
                args = (tuple(srcs), tuple(refs)) + mvargs
                if self.dev_submit is not None:
                    outs = self.dev_submit(
                        ("p_step", cfg),
                        lambda c: devsteps.make_p_encode_step(*c), args,
                        post=devsteps.prefetch_step_lanes,
                        fetch=devsteps.step_fetch_spec)
                else:
                    outs = devsteps.make_p_encode_step(*cfg)(*args)
        else:
            use_ichain = devchain and need_recon
            cfg = (meta.width, meta.height, meta.subsamp, p.blk_w, p.blk_h,
                   p.lossless, p.do_psy)
            xs = []
            for c in range(3):
                cw, ch = pcfg.cdims[c]
                pw, ph = pcfg.pdims[c]
                arr = d.residual.planes[c]
                x = np.full((ch, cw), 128, dtype=np.uint8)
                x[:ph, :] = arr[B:B + ph, B:B + cw]
                xs.append(x)
            if use_ichain:
                cfg = cfg + (self.pyramid_levels,)
                args = (tuple(xs), bd_grid, np.int32(d.quant),
                        np.int32(fq), np.int32(fthresh),
                        np.int32(self.do_intra_filter))
                if self.dev_submit is not None:
                    outs = self.dev_submit(
                        ("i_chain", cfg),
                        lambda c: devsteps.make_i_chain_step(*c), args,
                        post=devsteps.prefetch_step_lanes,
                        fetch=devsteps.step_fetch_spec)
                else:
                    outs = devsteps.make_i_chain_step(*cfg)(*args)
            else:
                cfg = cfg + (need_recon,)
                args = (tuple(xs), bd_grid, np.int32(d.quant))
                if self.dev_submit is not None:
                    outs = self.dev_submit(
                        ("i_step", cfg),
                        lambda c: devsteps.make_i_encode_step(*c), args,
                        post=devsteps.prefetch_step_lanes,
                        fetch=devsteps.step_fetch_spec)
                else:
                    outs = devsteps.make_i_encode_step(*cfg)(*args)
        if len(outs) == 5:  # chain step: keep the device reference state
            d.dev = dict(d.dev or {})
            d.dev.update(outs[4])
            outs = outs[:4]
            chained = True
        else:
            chained = False
        vscans, lls = devsteps.fetch_sparse_outs(outs)
        recons = outs[0]
        for c in range(3):
            cw, ch = pcfg.cdims[c]
            pw, ph = pcfg.pdims[c]
            kind, payload = vscans[c]
            if kind == "dense8":
                planecode.encode_plane_d8(w, payload[0], payload[1],
                                          lls[c], cw, ch)
            elif kind == "blob":
                planecode.encode_plane_blob(w, payload, lls[c])
            elif kind == "packed":
                planecode.encode_plane_packed(w, payload, cw * ch, lls[c],
                                              cw, ch)
            else:
                planecode.encode_plane(w, None, payload, lls[c], cw, ch)
            if chained:
                continue
            if p.has_ref:
                mcc = pcfg.mc_cfg(c)
                d.residual.planes[c][B:B + mcc.gh, B:B + mcc.gw] = (
                    np.asarray(recons[c]))
            elif need_recon:
                d.residual.view(c)[:, :] = np.asarray(recons[c])[:ph, :pw]
        if not chained and not p.has_ref:
            if need_recon:
                apply_intra_filter(d.residual, bd_grid, pcfg, d.quant,
                                   self.do_intra_filter)

        out = w.data()
        if not chained and p.has_ref:
            apply_inloop_filters(d.residual, mf, pcfg, d.quant,
                                 inter_filter, p.temporal_mc)
        return out

    # -- P-frame machinery ----------------------------------------------------

    def _motion_est(self, d):
        from . import hme
        hme.motion_est(self, d)

    def _scene_change_detection(self, d):
        from . import scd
        return scd.scene_change_detection(self, d)

    def _compute_auto_filter(self, d):
        """(ref: dsv_encoder.c:518-543)."""
        p = d.params
        SQR = lambda x: x * x
        intra_pct = self.curr_intra_pct
        scblocks = self.curr_scblocks
        chaos = self.motion_chaos
        psy = p.psyf_all
        norm = SQR(d.quant) >> 15
        relerr = ((SQR(intra_pct) + scblocks + self.avg_err * chaos)
                  // max(norm, 1))
        relerr = relerr + (relerr * psy >> 7)
        avg_chaos = (self.prev_chaos + chaos + 1) >> 1
        thresh = 8
        thresh += thresh * psy >> 5
        thresh -= (min(avg_chaos, 48) * psy * max(self.avg_err // 2, 1)
                   // (128 * (thresh - 2)))
        self.auto_filter = 1 if (chaos <= 1 or relerr > thresh) else 0

    # -- post-frame stats -----------------------------------------------------

    def _tally(self, d, outlen):
        """(ref: dsv_enc, dsv_encoder.c:1471-1570)."""
        p = d.params
        st = self.stats
        if p.has_ref:
            st.pnum += 1
            st.pfnum += 1 if self.auto_filter else 0
            st.psize += outlen
            st.pqual += self.rc_qual
            st.pmaxq = max(self.rc_qual, st.pmaxq)
            st.pmaxs = max(outlen, st.pmaxs)
            st.pminq = min(self.rc_qual, st.pminq)
            st.pmins = min(outlen, st.pmins)
            mf = d.final_mvs
            for i in range(p.nbh * p.nbv):
                fl = int(mf.flags[i])
                if fl & (1 << K.MV_BIT_EPRM):
                    st.eprm += 1
                if fl & (1 << K.MV_BIT_SKIP):
                    st.skip += 1
                elif fl & (1 << K.MV_BIT_INTRA):
                    st.mbI += 1
                    if mf.dc[i] & K.SRC_DC_PRED:
                        st.mbdc += 1
                    if mf.submask[i] != K.MASK_ALL_INTRA:
                        st.mbsub += 1
                        for b in range(4):
                            if mf.submask[i] & (1 << b):
                                st.mbsubs[b] += 1
                else:
                    st.mbP += 1
                    for val, fp, hp, qp in ((mf.x[i], "fpx", "hpx", "qpx"),
                                            (mf.y[i], "fpy", "hpy", "qpy")):
                        if val & 1:
                            setattr(st, qp, getattr(st, qp) + 1)
                        elif val & 3:
                            setattr(st, hp, getattr(st, hp) + 1)
                        else:
                            setattr(st, fp, getattr(st, fp) + 1)
            st.mb += p.nbh * p.nbv
        else:
            st.inum += 1
            st.ifnum += 1 if self.do_intra_filter else 0
            st.isize += outlen
            st.iqual += self.rc_qual
            st.imaxq = max(self.rc_qual, st.imaxq)
            st.imaxs = max(outlen, st.imaxs)
            st.iminq = min(self.rc_qual, st.iminq)
            st.imins = min(outlen, st.imins)
        if p.has_ref:
            self.refresh_ctr += 1
        if self.rc_mode != K.RC_CQP:
            if self.rc_mode == K.RC_CRF:
                self.rf_total += self.rc_qual
            else:
                self.rf_total += outlen
            self.rf_reset += 1
            if p.has_ref:
                self.total_P_frame_q += self.rc_qual
                self.avg_P_frame_q = self.total_P_frame_q // self.rf_reset
            self.rf_avg = self.rf_total // self.rf_reset
            if self.rf_reset >= K.RF_RESET:
                self.rf_total = self.rf_avg
                self.total_P_frame_q = self.total_P_frame_q // self.rf_reset
                self.rf_reset = 1


def _tally_intra_size(self, outlen, rc_qual):
    """Post-frame I stats for the batched path (matches _tally's I branch)."""
    st = self.stats
    st.inum += 1
    st.ifnum += 1 if self.do_intra_filter else 0
    st.isize += outlen
    st.iqual += rc_qual
    st.imaxq = max(rc_qual, st.imaxq)
    st.imaxs = max(outlen, st.imaxs)
    st.iminq = min(rc_qual, st.iminq)
    st.imins = min(outlen, st.imins)


Encoder._tally_intra_size = _tally_intra_size
