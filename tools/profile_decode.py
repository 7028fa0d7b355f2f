#!/usr/bin/env python
"""Decompose single-stream decode wall time per frame on the live backend.

The decode bench (BASELINE config 2) is far from both the C decoder and
the device's compute ceiling; this attributes the per-frame cost to:

  entropy : host packet parse + native scan decode + motion deser
  h2d     : shipping the dequant inputs (scan vectors, mv grids, scalars)
  dispatch: the chain-step call itself (async on the tunnel)
  fetch   : d2h of the packed visible payload

usage: tools/profile_decode.py [dsv_path]
  (default: encodes the CIF fixture at qp=60 gop=12 with the reference)
"""
import io
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import numpy as np
    from dsv2_tpu.codec import decoder as D
    from dsv2_tpu.utils import packet

    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        path = "/tmp/dsv2_profdec.dsv"
        subprocess.run([os.path.join(REPO, "build/ref/dsv2"), "e", "-y",
                        "-inp=" + os.path.join(
                            REPO, "tests/fixtures/cif352x288_420_12f.y4m"),
                        "-out=" + path, "-y4m=1", "-qp=60", "-gop=12"],
                       capture_output=True, check=True)
    data = open(path, "rb").read()
    print(f"# {path}: {len(data)} bytes, backend={jax.default_backend()}")

    acc = {}

    def run(label):
        dec = D.Decoder()
        t_all = time.perf_counter()
        n = 0
        for t, pkt in packet.iter_packets(io.BytesIO(data)):
            code, realize, fno = dec.decode_packet_lazy(pkt)
            if code == D.DEC_EOS:
                break
            if code != D.DEC_OK or realize is None:
                continue
            realize()
            n += 1
        acc[label] = (time.perf_counter() - t_all, n)

    run("warm")      # compile
    ts = []
    for i in range(3):
        run("e2e")
        ts.append(acc["e2e"][0])
    n = acc["e2e"][1]
    e2e = statistics.median(ts)
    print(f"e2e           {e2e*1000/n:8.2f} ms/frame ({n} frames)")

    # host-only pass: skip the device dispatch entirely by decoding with
    # device_chain disabled... no — that changes the math. Instead, time
    # the host entropy phase alone: parse every packet, run the native
    # scan decode + motion deser, never dispatch.
    from dsv2_tpu.bitstream import BitReader
    from dsv2_tpu.core import constants as K
    from dsv2_tpu.codec import motion, plane as planecode
    from dsv2_tpu.codec.decoder import _PCfg

    def host_only():
        meta = None
        t0 = time.perf_counter()
        n = 0
        for t, pkt in packet.iter_packets(io.BytesIO(data)):
            r = BitReader(pkt)
            ptype = packet.parse_packet_hdr(r)
            if ptype is None or not K.pt_is_pic(ptype):
                if ptype == K.PT_META:
                    meta = packet.decode_metadata(r)
                continue
            has_ref = K.pt_has_ref(ptype)
            r.align(); r.get_bits(32); r.align()
            blk_w = 16 << r.get_ueg(); blk_h = 16 << r.get_ueg()
            r.align()
            stats = [K.ONE_MARKER] * K.MAX_STAT
            stats[K.STABLE_STAT] = r.get_bit()
            if not has_ref:
                stats[K.MAINTAIN_STAT] = r.get_bit()
                stats[K.RINGING_STAT] = r.get_bit()
            else:
                stats[K.MODE_STAT] = r.get_bit()
                stats[K.EPRM_STAT] = r.get_bit()
            r.get_bit()
            quant = r.get_bits(K.MAX_QP_BITS)
            if r.get_bit():
                r.get_bits(15)
            r.align()
            pcfg = _PCfg(meta, blk_w, blk_h, has_ref, quant == 1)
            nblk = pcfg.nbh * pcfg.nbv
            bd = motion.decode_stability_blocks(r, pkt, nblk, has_ref,
                                                stats)
            if has_ref:
                motion.decode_motion(r, pkt, pcfg.nbh, pcfg.nbv, stats, bd)
            else:
                motion.decode_intra_meta(r, pkt, nblk, stats, bd)
            r.align()
            for c in range(3):
                cw, ch = pcfg.cdims[c]
                planecode.decode_plane(r, cw, ch)
            n += 1
        return (time.perf_counter() - t0) * 1000 / max(n, 1)

    th = statistics.median([host_only() for _ in range(3)])
    print(f"host entropy  {th:8.2f} ms/frame")

    # transfer terms on this stream's real shapes
    from dsv2_tpu.utils.packet import VideoMeta  # noqa
    # one P frame's dargs leaf count/bytes (from the chain path)
    dec = D.Decoder()
    leaves = []

    orig = dec.__class__._decode_picture_chain

    def spy(self, fno, has_ref, is_ref, pcfg, blk_w, blk_h, quant,
            lossless, do_filter, bd_grid, mf, vs, lls):
        if has_ref and not leaves:
            import jax.tree_util as jtu
            dargs = (tuple(vs), bd_grid, np.int32(quant), tuple(lls),
                     tuple(self.ref_dev["recon"]),
                     mf.grid(mf.x).astype(np.int32),
                     mf.grid(mf.y).astype(np.int32),
                     mf.grid(mf.flags).astype(np.int32),
                     mf.grid(mf.submask).astype(np.int32),
                     mf.grid(mf.dc).astype(np.int32))
            for leaf in jtu.tree_leaves(dargs):
                if isinstance(leaf, np.ndarray):
                    leaves.append(leaf.nbytes)
        return orig(self, fno, has_ref, is_ref, pcfg, blk_w, blk_h, quant,
                    lossless, do_filter, bd_grid, mf, vs, lls)

    dec.__class__._decode_picture_chain = spy
    for t, pkt in packet.iter_packets(io.BytesIO(data)):
        code, realize, fno = dec.decode_packet_lazy(pkt)
        if code == D.DEC_EOS:
            break
        if realize is not None:
            realize()
    dec.__class__._decode_picture_chain = orig
    print(f"h2d leaves/P-frame: {len(leaves)} host arrays, "
          f"{sum(leaves)} bytes total")

    # RTT + link right now
    rtt = []
    one = jax.device_put(np.zeros(8, np.int32))
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(one))
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(one))
        rtt.append((time.perf_counter() - t0) * 1000)
    print(f"dispatch+fetch rtt {statistics.median(rtt):8.2f} ms")
    rng = np.random.default_rng(0)
    h = rng.integers(0, 256, 1 << 20, dtype=np.uint8)
    jax.device_put(h)  # warm
    up = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_put(h).block_until_ready()
        np.asarray(f(one))  # fence
        up.append((time.perf_counter() - t0))
    print(f"h2d 1MB       {statistics.median(up)*1000:8.2f} ms")


if __name__ == "__main__":
    main()
