#!/usr/bin/env python
"""GOP-parallel decode: closed GOPs decode concurrently with lockstep
device batching (no reference equivalent — the reference decoder is
single-threaded). Output is frame-exact vs sequential decoding.

usage: parallel_decode.py input.dsv output.y4m [width]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    src, out = sys.argv[1], sys.argv[2]
    width = int(sys.argv[3]) if len(sys.argv) > 3 else None
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from dsv2_tpu import enable_compile_cache
    enable_compile_cache()
    from dsv2_tpu.parallel.gop import decode_gops_parallel
    from dsv2_tpu.utils import y4m, packet
    from dsv2_tpu.bitstream import BitReader

    with open(src, "rb") as f:
        data = f.read()
    import io
    # metadata for the writer
    meta = None
    for t, buf in packet.iter_packets(io.BytesIO(data)):
        import dsv2_tpu.core.constants as K
        if t == K.PT_META:
            r = BitReader(buf)
            packet.parse_packet_hdr(r)
            meta = packet.decode_metadata(r)
            break
    if meta is None:
        raise SystemExit("no metadata packet found")
    frames = decode_gops_parallel(io.BytesIO(data), width=width)
    with open(out, "wb") as f:
        w = y4m.Y4MWriter(f, meta.width, meta.height, meta.subsamp,
                          fps=(meta.fps_num, meta.fps_den),
                          aspect=(meta.aspect_num, meta.aspect_den))
        for fr in frames:
            w.write_frame((fr.view(0), fr.view(1), fr.view(2)))
    print(f"{out}: {len(frames)} frames")


if __name__ == "__main__":
    main()
