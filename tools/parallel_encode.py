#!/usr/bin/env python
"""GOP-chunked parallel encode (the reference's parallel_encode.sh as a
first-class tool): shards a Y4M input into closed GOPs and either

  - runs worker processes with -noeos semantics (like the reference), or
  - with --lockstep, encodes all GOP streams in ONE process with lockstep
    device batching: every motion search / frame transform dispatch carries
    a full batch of streams (the TPU path; a device tunnel admits only one
    client process).

Outputs are byte-concatenated; both modes produce the exact bytes of a
chunked sequential encode.

Raw planar YUV input (the reference's parallel_encode_yuv.sh) is selected
by a non-.y4m input suffix or an explicit -y4m=0; pass -w= -h= -fmt=
(and -fps_num/-fps_den) exactly like the encoder CLI.

usage: parallel_encode.py input.{y4m,yuv} output.dsv [workers] [--lockstep]
                          [extra -flags...]
"""
import os
import subprocess
import sys
import tempfile


def _is_y4m(src, extra):
    for a in extra:
        if a.startswith("-y4m="):
            return bool(int(a.split("=")[1]))
    return src.endswith(".y4m")


def _open_reader(f, src, extra):
    """Y4MReader or RawYUVReader + VideoMeta from the CLI flags."""
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import parse_args, ENC_PARAMS
    opts, _ = parse_args([a for a in extra if a != "--lockstep"], ENC_PARAMS)
    if _is_y4m(src, extra):
        rdr = y4m.Y4MReader(f)
        meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                         fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                         aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])
    else:
        meta = VideoMeta(width=opts["w"], height=opts["h"],
                         subsamp=opts["fmt"], fps_num=opts["fps_num"],
                         fps_den=opts["fps_den"],
                         aspect_num=opts["aspect_num"],
                         aspect_den=opts["aspect_den"])
        rdr = y4m.RawYUVReader(f, meta.width, meta.height, meta.subsamp)
    return rdr, meta, opts


def lockstep_main(src, out, width, extra):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from dsv2_tpu import enable_compile_cache
    enable_compile_cache()
    from dsv2_tpu.utils.packet import encode_eos
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep

    with open(src, "rb") as f:
        rdr, meta, opts = _open_reader(f, src, extra)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    gop = opts["gop"] if opts["gop"] > 0 else 48
    streams = [frames[i:i + gop] for i in range(0, len(frames), gop)]

    def factory():
        from dsv2_tpu.cli import make_encoder
        o = dict(opts)
        o["gop"] = gop
        enc = make_encoder(meta, o)
        enc.hme_backend = "wave"
        return enc

    parts = encode_streams_lockstep(streams, factory, width=width)
    with open(out, "wb") as f:
        for p in parts:
            f.write(p)
        f.write(encode_eos())
    print(out)


def main():
    src, out = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    lockstep = "--lockstep" in rest
    rest = [a for a in rest if a != "--lockstep"]
    workers = None
    if rest and not rest[0].startswith("-"):
        workers = int(rest[0])
        rest = rest[1:]
    extra = rest
    if lockstep:
        return lockstep_main(src, out, workers, extra)
    workers = workers or os.cpu_count()
    gop = 48
    for a in extra:
        if a.startswith("-gop="):
            gop = int(a.split("=")[1])
    # probe frame count
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    with open(src, "rb") as f:
        rdr, _, _ = _open_reader(f, src, extra)
        n = 0
        while rdr.read_frame() is not None:
            n += 1
    if gop <= 0:
        gop = n
    y4m_flag = "-y4m=%d" % int(_is_y4m(src, extra))
    ranges = [(s, min(s + gop, n)) for s in range(0, n, gop)]
    tmp = tempfile.mkdtemp(prefix="dsv2par")
    procs = []
    outs = []
    for k, (s, e) in enumerate(ranges):
        o = os.path.join(tmp, "chunk%04d.dsv" % k)
        outs.append(o)
        cmd = [sys.executable, "-m", "dsv2_tpu", "e", "-inp=" + src,
               "-out=" + o, y4m_flag, "-sfr=%d" % s, "-nfr=%d" % (e - s),
               "-noeos=1", "-gop=%d" % gop] + extra
        procs.append(subprocess.Popen(cmd))
        while len([p for p in procs if p.poll() is None]) >= workers:
            procs[0].wait()
    for p in procs:
        p.wait()
    from dsv2_tpu.utils.packet import encode_eos
    with open(out, "wb") as f:
        for o in outs:
            f.write(open(o, "rb").read())
        f.write(encode_eos())
    print(out)


if __name__ == "__main__":
    main()
