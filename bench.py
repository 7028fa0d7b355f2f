#!/usr/bin/env python
"""Encoder throughput benchmark vs the reference C encoder.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline = our fps / single-threaded C reference fps measured on this
host in the same run (the reference publishes no numbers; BASELINE.md).
Headline config: FHD 1920x1080 4:2:0 intra encode, 32 frames, qp=60 —
the driver-defined metric resolution (BASELINE.md "1080p encode fps per
chip"); the produced .dsv is byte-identical to the reference binary's.
Chunked device batches overlap host serialization with device compute;
coefficients cross the link in the dense split-band format. When the TPU
tunnel is unreachable the bench falls back to CIF on CPU (compiling the
FHD program on the CPU backend would blow the time budget).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ARGS = ["-qp=60", "-gop=0"]


def ensure_inputs(w, h, nframes):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import mkfixtures
    path = f"/tmp/dsv2_bench_{w}x{h}_{nframes}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, w, h, nframes)
    return path


def ref_fps(ref_bin, src, nframes):
    t0 = time.perf_counter()
    subprocess.run([ref_bin, "e", "-y", "-inp=" + src,
                    "-out=/tmp/dsv2_bench_ref.dsv", "-y4m=1"] + ARGS,
                   capture_output=True)
    dt = time.perf_counter() - t0
    return nframes / dt


def our_fps(src, want, nframes, chunk):
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.batch import encode_intra_batch

    frames = []
    with open(src, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])

    def mk():
        return make_encoder(meta, default_enc_opts(qp=60, gop=0))

    # warmup (jit compile of the batched device pipeline, same batch shape)
    enc = mk()
    encode_intra_batch(enc, frames, chunk=chunk)
    # timed run
    enc = mk()
    t0 = time.perf_counter()
    out = encode_intra_batch(enc, frames, chunk=chunk)
    out += enc.end_of_stream()
    dt = time.perf_counter() - t0
    ours = b"".join(out)
    if ours != want:
        print("# WARNING: stream does not byte-match the reference",
              file=sys.stderr)
    return nframes / dt


def _pick_platform():
    """The axon TPU tunnel can hang jax initialization when it is down;
    probe it in a disposable subprocess and fall back to CPU so the bench
    always reports a number."""
    if os.environ.get("DSV2_JAX_PLATFORM"):
        return os.environ["DSV2_JAX_PLATFORM"]
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        capture_output=True, timeout=180)
    if probe.returncode != 0:
        return "cpu"
    return None


def main():
    import dsv2_tpu
    try:
        plat = _pick_platform()
    except subprocess.TimeoutExpired:
        plat = "cpu"
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            print("# WARNING: TPU tunnel unreachable, benching on CPU",
                  file=sys.stderr)
    dsv2_tpu.enable_compile_cache()
    if plat == "cpu":
        w, h, nframes, chunk, metric = 352, 288, 64, 16, \
            "cif_intra_encode_fps_cpu"
    else:
        w, h, nframes, chunk, metric = 1920, 1080, 32, 8, \
            "fhd_intra_encode_fps"
    ref_dir = subprocess.run([os.path.join(REPO, "tools", "build_ref.sh")],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    src = ensure_inputs(w, h, nframes)
    c_fps = ref_fps(os.path.join(ref_dir, "dsv2"), src, nframes)
    want = open("/tmp/dsv2_bench_ref.dsv", "rb").read()
    fps = our_fps(src, want, nframes, chunk)
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / c_fps, 4),
    }))
    print(f"# reference C encoder: {c_fps:.2f} fps (same host, same config)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
