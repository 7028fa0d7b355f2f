"""Multi-chip parallel encoding over a jax.sharding.Mesh.

The multi-chip design is STREAM/GOP-PARALLEL: independent closed GOPs
(lockstep lanes) shard across the mesh's "gop" axis, so N chips each run
their own streams' full encode steps inside one SPMD program — the
TPU-first form of the reference's process-per-GOP parallelism
(ref: parallel_encode.sh + the closed-GOP bitstream design: every GOP
starts with a metadata packet and uses relative link offsets, so the
host byte-concatenates per-GOP streams into one valid .dsv;
dsv_main.c:136-138, dsv_encoder.c:1247-1251).

Intra-frame SPATIAL sharding was evaluated and deliberately rejected:
the codec's per-frame hot paths are sequential wavefronts (the in-loop
filters' block-to-block carries, bmc.c:459-659, and the HME
left/top/topleft dependency, hme.c:1202-1298), so a width-split frame
serializes on halo exchanges every few rows — ICI latency-bound with no
throughput win over adding more streams to the gop axis. Throughput
scaling comes from lanes (always available: a video has many GOPs), not
from splitting one frame.

This module provides the host-side GOP splitter/concatenator, parallel
decode, and the single-frame step used by the driver's compile check.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constants as K
from ..ops import sbt, hzcc


def device_intra_step(cfg_sbt, cfg_hzcc):
    """Single-frame luma intra transform+quant step (jittable, vmappable):
    pixels -> (dequantized coefs, scan values)."""
    def step(px, blockdata, q):
        x = px.astype(jnp.int32) - 128
        coefs = sbt.make_fwd_sbt(cfg_sbt)(x, blockdata)
        deq, v = _quant(coefs, blockdata, q, cfg_hzcc)
        recon = sbt.make_inv_sbt(cfg_sbt)(deq, blockdata, q)
        return jnp.clip(recon + 128, 0, 255).astype(jnp.uint8), v
    return step


def _quant(coefs, blockdata, q, cfg):
    f = hzcc.make_quantize(cfg)
    dummy = jnp.zeros((cfg.nbv, cfg.nbh), dtype=bool)
    return f(coefs, blockdata, dummy, dummy, q)


def split_gops(total_frames, gop):
    """Frame ranges of independent closed GOPs."""
    if gop <= 0:
        return [(0, total_frames)]
    out = []
    s = 0
    while s < total_frames:
        out.append((s, min(s + gop, total_frames)))
        s += gop
    return out


def encode_gops_parallel(frames, meta, gop, enc_factory, workers=None):
    """Host-parallel encode of independent GOP chunks; returns the
    concatenated .dsv stream (each chunk starts with metadata + I frame,
    link offsets are chunk-relative so byte concatenation is valid)."""
    import concurrent.futures as cf

    ranges = split_gops(len(frames), gop)

    def encode_range(rng):
        s, e = rng
        enc = enc_factory()
        chunks = []
        for f in range(s, e):
            chunks.extend(enc.encode_frame(frames[f]))
        return b"".join(chunks)

    if workers is None or workers <= 1 or len(ranges) == 1:
        parts = [encode_range(r) for r in ranges]
    else:
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            parts = list(ex.map(encode_range, ranges))
    eos = enc_factory().end_of_stream()
    return b"".join(parts) + b"".join(eos)


def split_gop_packets(stream):
    """Group a .dsv stream's packets into independently-decodable GOP
    chunks (every closed GOP starts with its own metadata packet;
    ref: dsv_encoder.c:469-491)."""
    from ..utils import packet
    chunks = []
    cur = None
    for t, buf in packet.iter_packets(stream):
        if t == K.PT_EOS:
            break
        if t == K.PT_META or cur is None:
            cur = []
            chunks.append(cur)
        cur.append((t, buf))
    return chunks


def decode_gops_parallel(stream, width=None, postsharp=False):
    """Decode independent GOP chunks concurrently with lockstep device
    batching (the decode analog of encode_streams_lockstep; the reference
    has no parallel decode). Returns frames in stream order — byte-equal
    to sequential decoding."""
    import threading
    from ..codec.decoder import Decoder, DEC_EOS
    from .dynbatch import LockstepBatcher

    chunks = split_gop_packets(stream)
    n = len(chunks)
    if n == 0:
        return []
    width = width or n
    batcher = LockstepBatcher(width)
    results = [None] * n
    errors = []

    def run(i):
        batcher.thread_begin()
        try:
            dec = Decoder(postsharp=postsharp)
            dec.dev_submit = batcher.submit
            frames = []
            for t, buf in chunks[i]:
                code, frame, fno = dec.decode_packet(buf)
                if code == DEC_EOS:
                    break
                if frame is not None:
                    frames.append(frame)
            results[i] = frames
        except BaseException as exc:
            errors.append(exc)
        finally:
            batcher.thread_done()

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return [f for fs in results for f in fs]
