#!/usr/bin/env python
"""Stage-trace ONLY the timed intra-batch encode (bench.py's stage table
accumulates warmup + timed runs together, which buries the steady-state
split). Also reports per-frame wall budget."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import mkfixtures
    from dsv2_tpu.utils import y4m, trace
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.codec.encoder import Encoder
    from dsv2_tpu.parallel.batch import encode_intra_batch

    W, H, N = 352, 288, 128
    path = f"/tmp/dsv2_bench_cif{N}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, W, H, N)
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)

    def mk():
        enc = Encoder()
        enc.set_metadata(VideoMeta(width=W, height=H))
        enc.gop = 0
        enc.quality = 60 * 4
        enc.start()
        return enc

    t0 = time.perf_counter()
    encode_intra_batch(mk(), frames)
    print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)
    trace._acc.clear()
    trace._cnt.clear()
    trace.enable()
    t0 = time.perf_counter()
    encode_intra_batch(mk(), frames)
    dt = time.perf_counter() - t0
    print(f"timed: {dt:.2f}s  {N/dt:.1f} fps  {dt/N*1e3:.2f} ms/frame",
          flush=True)
    trace.report(sys.stdout)
    trace.enable(False)


if __name__ == "__main__":
    main()
