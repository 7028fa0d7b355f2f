#!/usr/bin/env python
"""GOP-chunked parallel encode (the reference's parallel_encode.sh as a
first-class tool): shards a Y4M input into closed GOPs, encodes chunks with
-noeos semantics in worker processes, byte-concatenates the outputs.

usage: parallel_encode.py input.y4m output.dsv [workers] [extra -flags...]
"""
import os
import subprocess
import sys
import tempfile


def main():
    src, out = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else os.cpu_count()
    extra = sys.argv[4:]
    gop = 48
    for a in extra:
        if a.startswith("-gop="):
            gop = int(a.split("=")[1])
    # probe frame count
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from dsv2_tpu.utils import y4m
    with open(src, "rb") as f:
        rdr = y4m.Y4MReader(f)
        n = 0
        while rdr.read_frame() is not None:
            n += 1
    if gop <= 0:
        gop = n
    ranges = [(s, min(s + gop, n)) for s in range(0, n, gop)]
    tmp = tempfile.mkdtemp(prefix="dsv2par")
    procs = []
    outs = []
    for k, (s, e) in enumerate(ranges):
        o = os.path.join(tmp, "chunk%04d.dsv" % k)
        outs.append(o)
        cmd = [sys.executable, "-m", "dsv2_tpu", "e", "-inp=" + src,
               "-out=" + o, "-y4m=1", "-sfr=%d" % s, "-nfr=%d" % (e - s),
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
