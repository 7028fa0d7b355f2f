#!/usr/bin/env python
"""Encoder throughput benchmark vs the reference C encoder.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N,
   "exact": bool, "extra": {...}}

vs_baseline = our fps / single-threaded C reference fps measured on this
host in the same run (the reference publishes no numbers; BASELINE.md).
"exact" is the byte-parity verdict for the headline stream: when false,
vs_baseline is NOT a valid codec comparison (the JSON also carries
"vs_baseline_valid": false) — bit-exactness vs the reference binary is
the contract (CLAUDE.md).

Headline config: FHD 1920x1080 4:2:0 intra encode, 32 frames, qp=60 — the
driver-defined metric resolution (BASELINE.md "1080p encode fps per
chip"). Timed runs are MEDIAN-OF-3 for both encoders (the axon tunnel
bandwidth swings 4-170 MB/s run to run; single-shot numbers are weather).

"extra" carries the other BASELINE configs plus transfer-independent
numbers, run in PRIORITY ORDER under a global wall-clock budget
(DSV2_BENCH_BUDGET seconds, default 900): each extra is entered only if
enough budget remains, is hard-capped with SIGALRM, and the record is
re-persisted to bench_artifacts/ after every metric — one slow or crashed
extra can degrade itself but never erase the headline (round-4 lesson:
BENCH_r04 was rc=124/parsed:null because the whole record printed only
after every extra finished).

  - device_ms_per_frame: pure device compute per 1080p intra frame
  - link_MBps: end-to-end d2h fetch bandwidth (MB/s) of a FRESH device
    buffer per run (re-fetching one buffer measures the host-side
    cache); runs LAST — diagnostics never outrank BASELINE configs
  - p_lockstep: BASELINE config 1 — Stefan-class CIF -qp=60 -gop=48
    (README.md:141) lockstep x8 vs the C encoder; EVERY lane is
    byte-checked against the reference binary's matching GOP
  - decode: BASELINE config 2 — .dsv -> frames vs the single-header
    dsv28dec reference decoder, output byte-checked
  - mobile_cif: BASELINE config 3 — CIF GOP=60 at effort 10 (the
    default effort on both encoders; README.md:181,:208)
  - lossless444: BASELINE config 5 — FHD 4:4:4 lossless batch intra
  - parkrun_720p: BASELINE config 4 — 1280x720 GOP=250 qpel+EPRM
    motion stress (README.md:229), 32 frames x4 streams (128 frames
    per side keeps it inside the bench budget)
  - decode_fhd: config 2 at the headline resolution

Transient tunnel failures (remote_compile / read-body JaxRuntimeErrors)
are retried with backoff so an HTTP hiccup degrades one run, not the
record.
"""
import contextlib
import json
import os
import signal
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ARGS = ["-qp=60", "-gop=0"]
P_GOP = 48          # BASELINE config 1: Stefan CIF -qp=60 -gop=48
P_WIDTH = 8
P_GOP_CPU = 12      # smaller CPU-fallback geometry
P_WIDTH_CPU = 4

BUDGET = float(os.environ.get("DSV2_BENCH_BUDGET", "900"))
_T0 = time.monotonic()


def remaining():
    return BUDGET - (time.monotonic() - _T0)


def mark(label):
    """Coarse stage timer on stderr: shows where the headline wall went
    (driver logs keep it; skipped-extra postmortems need it)."""
    print(f"# t+{time.monotonic() - _T0:6.1f}s {label}", file=sys.stderr,
          flush=True)


class MetricTimeout(Exception):
    pass


@contextlib.contextmanager
def metric_cap(seconds):
    """Hard per-metric wall-clock cap (SIGALRM; main thread only). A
    metric that overruns raises MetricTimeout at the next bytecode
    boundary instead of eating the whole bench budget."""
    def _raise(signum, frame):
        raise MetricTimeout()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.setitimer(signal.ITIMER_REAL, max(1.0, seconds))
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def _is_transient(exc):
    s = repr(exc)
    return any(m in s for m in ("remote_compile", "read body",
                                "DEADLINE_EXCEEDED", "UNAVAILABLE",
                                "Connection reset", "EOF"))


def with_retry(fn, tries=3, backoff=5.0):
    """Retry transient tunnel flakes (seen: JaxRuntimeError
    'remote_compile: read body' mid-bench) so an HTTP hiccup degrades
    one run, never the record."""
    for i in range(tries):
        try:
            return fn()
        except MetricTimeout:
            raise
        except Exception as e:
            if i + 1 == tries or not _is_transient(e):
                raise
            print(f"# transient failure, retrying in {backoff}s: {e!r}",
                  file=sys.stderr)
            time.sleep(backoff)
            backoff *= 2


def ensure_inputs(w, h, nframes):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import mkfixtures
    path = f"/tmp/dsv2_bench_{w}x{h}_{nframes}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, w, h, nframes)
    return path


def median3(fn):
    vals = [fn() for _ in range(3)]
    return statistics.median(vals)


def ref_fps(ref_bin, src, nframes, args, out="/tmp/dsv2_bench_ref.dsv"):
    def run():
        t0 = time.perf_counter()
        subprocess.run([ref_bin, "e", "-y", "-inp=" + src,
                        "-out=" + out, "-y4m=1"] + args,
                       capture_output=True)
        return nframes / (time.perf_counter() - t0)
    return median3(run)


def read_frames(src):
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
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
    return frames, meta


def intra_warm(src, chunk, qp=60):
    """Trace+compile the batched intra pipeline for this shape (the same
    programs our_intra_fps times). Runs in a thread overlapped with the
    C-side reference encodes: tracing releases the GIL during remote
    compiles and the C encoder is a subprocess."""
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.batch import encode_intra_batch
    frames, meta = read_frames(src)
    mark("intra warm start")
    enc = make_encoder(meta, default_enc_opts(qp=qp, gop=0))
    encode_intra_batch(enc, frames, chunk=chunk)
    mark("intra warm done")


def our_intra_fps(src, want, nframes, chunk, qp=60, warm=True):
    """Returns (fps, exact)."""
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.batch import encode_intra_batch

    frames, meta = read_frames(src)

    def mk():
        return make_encoder(meta, default_enc_opts(qp=qp, gop=0))

    # warmup (jit compile of the batched device pipeline, same batch shape)
    if warm:
        enc = mk()
        encode_intra_batch(enc, frames, chunk=chunk)

    exact = [True]

    def run():
        enc = mk()
        t0 = time.perf_counter()
        out = encode_intra_batch(enc, frames, chunk=chunk)
        out += enc.end_of_stream()
        dt = time.perf_counter() - t0
        ours = b"".join(out)
        if ours != want:
            exact[0] = False
            print("# WARNING: stream does not byte-match the reference",
                  file=sys.stderr)
        return nframes / dt

    return median3(lambda: with_retry(run)), exact[0]


def device_ms_per_frame(src, chunk):
    """Pure device compute per intra frame: repeated dispatch of the
    batched step on device-resident inputs; only the (tiny) metadata
    vector crosses the link per call."""
    import numpy as np
    import jax
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel import batch as pb
    from dsv2_tpu.core.frame import B

    frames, meta = read_frames(src)
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=0))
    ctx = pb._prep_chunk(enc, frames[:chunk])
    datas, pcfg, p = ctx["datas"], ctx["pcfg"], ctx["p"]
    xs = [[], [], []]
    for d in datas:
        for c in range(3):
            cw, ch = pcfg.cdims[c]
            pw, ph = pcfg.pdims[c]
            arr = d.padded.planes[c]
            x = np.full((ch, cw), 128, dtype=np.uint8)
            x[:ph, :] = arr[B:B + ph, B:B + cw]
            xs[c].append(x)
    xs = [jax.device_put(np.stack(a)) for a in xs]
    bds = jax.device_put(np.stack(ctx["blockdatas"]))
    qs = jax.device_put(np.asarray(ctx["quants"], dtype=np.int32))
    from dsv2_tpu.core import constants as K
    fn = pb._device_batch_fn(meta.width, meta.height, meta.subsamp,
                             p.blk_w, p.blk_h, p.lossless, p.do_psy,
                             enc.gop != K.GOP_INTRA, ctx["analyze"])
    out = fn(xs[0], xs[1], xs[2], bds, qs)
    np.asarray(out[1])  # prime + sync

    def run():
        t0 = time.perf_counter()
        o = fn(xs[0], xs[1], xs[2], bds, qs)
        np.asarray(o[1])  # smalls: tiny fetch forces completion
        return (time.perf_counter() - t0) * 1000.0 / len(datas)

    return median3(run)


def link_mbps():
    """End-to-end d2h bandwidth: dispatch + fetch of a FRESH 16 MB
    incompressible device buffer per run. Re-fetching one buffer measures
    the host-side array cache (the physically impossible 139-172 Gbps of
    the round-3/4 records: the first fetch paid the link, the median run
    returned a cached copy); a fresh buffer per run pays the tunnel every
    time, wherever in dispatch/compute/fetch the transfer happens."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    nbytes = 16 << 20
    gen = jax.jit(lambda k: jax.random.bits(k, (nbytes,), jnp.uint8))
    gen(jax.random.key(0)).block_until_ready()  # compile

    def run(i):
        t0 = time.perf_counter()
        x = gen(jax.random.key(2 + i))
        b = np.asarray(x)
        dt = time.perf_counter() - t0
        assert b.size == nbytes
        return (nbytes / (1 << 20)) / dt  # MB/s

    return statistics.median([run(i) for i in range(3)])


def _ref_lane_caches(ref_bin, src, w, h, n, gop, qp, fps_n, nlanes):
    wants = []
    for i in range(nlanes):
        out_i = (f"/tmp/dsv2_bench_pref_{w}x{h}n{n}g{gop}q{qp}_l{i}.dsv")
        if not os.path.exists(out_i):
            subprocess.run([ref_bin, "e", "-y", "-inp=" + src,
                            "-out=" + out_i, "-y4m=1",
                            f"-gop={gop}", f"-qp={qp}",
                            f"-sfr={i * fps_n}", f"-nfr={fps_n}"],
                           capture_output=True)
        wants.append(open(out_i, "rb").read())
    return wants


def p_lockstep(ref_bin, gop, width, w=352, h=288, qp=60, name=None,
               runs=3, c_runs=1, warm_frames=None, frames_per_stream=None,
               groups=1, prefetch=False,
               pref="/tmp/dsv2_bench_pref.dsv"):
    """Lockstep P-frame encode (width*groups streams x frames_per_stream
    frames, default gop frames each) vs the C encoder on the identical
    input; EVERY lane is byte-checked against the reference binary
    encoding the same frame range (-sfr/-nfr chunk semantics,
    parallel_encode.sh:35-75). Default geometry is BASELINE config 1
    (Stefan-class CIF -qp=60 -gop=48, README.md:141); configs 3/4 call
    it with their own shapes. groups>1 runs that many width-lane
    batchers concurrently so device flushes of one group overlap host
    phases of the others (measured 3.6x aggregate at 8x2 vs 8x1).
    c_runs: timed C-encoder passes (1 keeps the extras inside the bench
    budget; the C side has low run-to-run variance on an idle host)."""
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep
    from dsv2_tpu.utils.packet import encode_eos

    fps_n = frames_per_stream or gop
    nlanes = width * groups
    n = nlanes * fps_n
    src = ensure_inputs(w, h, n)
    if prefetch:
        # prep-only mode (runs in the headline warm window): generate the
        # input fixture and the per-lane reference chunk caches so the
        # timed metric later pays neither
        _ref_lane_caches(ref_bin, src, w, h, n, gop, qp, fps_n, nlanes)
        return None

    def cref():
        t0 = time.perf_counter()
        subprocess.run([ref_bin, "e", "-y", "-inp=" + src,
                        "-out=" + pref, "-y4m=1",
                        f"-gop={gop}", f"-qp={qp}"], capture_output=True)
        return n / (time.perf_counter() - t0)

    c_fps = statistics.median([cref() for _ in range(c_runs)])
    # reference bytes per lane: the reference encoding the same frame
    # range as an independent chunked stream (parallel_encode.sh GOP
    # chunking). Round 4 checked lane 0 only; the headline claim is
    # all-lane exactness, so check all lanes. Lane outputs are cached on
    # disk keyed by the full config (the input fixture is deterministic),
    # so re-running the bench skips ~8 reference encodes per metric.
    wants = _ref_lane_caches(ref_bin, src, w, h, n, gop, qp, fps_n, nlanes)
    frames, meta = read_frames(src)
    streams = [frames[i:i + fps_n] for i in range(0, n, fps_n)]

    def factory():
        return make_encoder(meta, default_enc_opts(qp=qp, gop=gop))

    # warm (jit compile); long configs warm on a short slice of each
    # stream — same traced shapes, fraction of the frames
    wstreams = streams if warm_frames is None else \
        [s[:warm_frames] for s in streams]
    with_retry(lambda: encode_streams_lockstep(wstreams, factory,
                                               width=width, groups=groups))
    exact = [True]
    eos_len = len(encode_eos())

    def run():
        t0 = time.perf_counter()
        out = encode_streams_lockstep(streams, factory, width=width,
                                      groups=groups)
        dt = time.perf_counter() - t0
        # lockstep streams carry no EOS packet (the concatenating caller
        # appends one); each reference chunk ends with one
        for i in range(nlanes):
            if (wants[i][:len(out[i])] != out[i]
                    or len(wants[i]) - len(out[i]) != eos_len):
                exact[0] = False
                print(f"# WARNING: P stream {i} does not byte-match the"
                      " reference", file=sys.stderr)
        return n / dt

    fps = statistics.median([with_retry(run) for _ in range(runs)])
    return {"config": name or f"cif_qp{qp}_gop{gop}_x{width}g{groups}",
            "fps": round(fps, 3), "c_fps": round(c_fps, 3),
            "vs_baseline": round(fps / c_fps, 4), "exact": exact[0],
            "exact_lanes": nlanes, "runs": runs}


def lossless444_batch(ref_bin, nframes=8, chunk=4):
    """BASELINE config 5: FHD 4:4:4 mathematically-lossless (CRF
    quality 100) batch intra encode vs the C encoder, byte-checked."""
    w, h = 1920, 1080
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import mkfixtures
    src = f"/tmp/dsv2_bench_{w}x{h}_444_{nframes}.y4m"
    if not os.path.exists(src):
        mkfixtures.write_y4m(src, w, h, nframes, subs="444")
    out = "/tmp/dsv2_bench_ll444_ref.dsv"
    c_fps = ref_fps(ref_bin, src, nframes,
                    ["-qp=100", "-gop=0"], out=out)
    want = open(out, "rb").read()
    fps, exact = our_intra_fps(src, want, nframes, chunk, qp=100)
    return {"config": "fhd_lossless444_crf_intra",
            "fps": round(fps, 3), "c_fps": round(c_fps, 3),
            "vs_baseline": round(fps / c_fps, 4), "exact": exact}


def p_chunk_input(ref_bin, gop=P_GOP, w=352, h=288, qp=60):
    """The decode metric's input: the reference binary encoding lane 0's
    frame range as a chunked stream (identical to what p_lockstep caches;
    regenerated here so the decode metric never depends on p_lockstep
    having run first)."""
    n = P_WIDTH * gop
    src = ensure_inputs(w, h, n)
    out = f"/tmp/dsv2_bench_pref_{w}x{h}n{n}g{gop}q{qp}_l0.dsv"
    if not os.path.exists(out):
        subprocess.run([ref_bin, "e", "-y", "-inp=" + src,
                        "-out=" + out, "-y4m=1", f"-gop={gop}",
                        f"-qp={qp}", "-sfr=0", f"-nfr={gop}"],
                       capture_output=True)
    return out


def decode_fps(ref_build, dsv_path, runs=2):
    """BASELINE config 2: decode dsv_path to frames, wall-clock vs the
    single-header d28dec reference decoder binary on the same file;
    our y4m output byte-checked against d28dec's."""
    import io
    import numpy as np
    from dsv2_tpu.codec import decoder as D
    from dsv2_tpu.utils import packet, y4m

    d28 = os.path.join(ref_build, "d28dec")
    refy = "/tmp/dsv2_bench_dec_ref.y4m"

    def ref_run():
        t0 = time.perf_counter()
        subprocess.run([d28, "-y", "-inp=" + dsv_path, "-out=" + refy,
                        "-y4m=1"], capture_output=True)
        return time.perf_counter() - t0

    ref_dt = median3(ref_run)
    want = open(refy, "rb").read()
    data = open(dsv_path, "rb").read()

    def our_run():
        buf = io.BytesIO()
        t0 = time.perf_counter()
        writer = None
        n = 0
        # chunked decode: runs of P frames fuse into one scan dispatch +
        # one [K, npix] fetch (intra runs vmap); host entropy decode of
        # the next chunk overlaps device compute of the previous one
        for fno, meta, frame in D.decode_stream_chunked(io.BytesIO(data)):
            if writer is None:
                writer = y4m.Y4MWriter(buf, meta.width, meta.height,
                                       meta.subsamp,
                                       (meta.fps_num, meta.fps_den),
                                       (meta.aspect_num, meta.aspect_den))
            writer.write_frame([frame.view(c) for c in range(3)])
            n += 1
        return time.perf_counter() - t0, n, buf.getvalue()

    with_retry(our_run)  # warm (jit compile of the decode chain)
    dts = []
    n = 0
    ours = b""
    for _ in range(runs):
        dt, n, ours = with_retry(our_run)
        dts.append(dt)
    our_dt = statistics.median(dts)
    exact = ours == want
    if not exact:
        print("# WARNING: decode output does not byte-match d28dec",
              file=sys.stderr)

    # device-resident throughput: pixels never leave the chip, one digest
    # scalar does. The tunnel's d2h floor alone (152 KB/frame at ~36 MB/s
    # ≈ 4 ms) exceeds d28dec's CIF wall clock, so this is the honest
    # measure of DECODE speed as opposed to link speed; exactness comes
    # from the full-fetch passes above, the digest cross-checks that the
    # resident pass decoded the same pixels as d28dec's output.
    want_digest = 0
    wf = io.BytesIO(want)
    wrdr = y4m.Y4MReader(wf)
    while True:
        ps = wrdr.read_frame()
        if ps is None:
            break
        for p in ps:
            want_digest += int(np.asarray(p).astype(np.int64).sum())
    want_digest &= 0xFFFFFFFF

    def res_run():
        rs = D.ResidentSum()
        t0 = time.perf_counter()
        k = 0
        for _fno, _meta, _fr in D.decode_stream_chunked(
                io.BytesIO(data), resident=rs):
            k += 1
        tot = rs.total()   # the one d2h sync
        return time.perf_counter() - t0, k, tot
    with_retry(res_run)   # warm: the per-chunk digest-sum programs
    res_dts = []
    digest_ok = True
    for _ in range(runs):
        dt, k, tot = with_retry(res_run)
        res_dts.append(dt)
        digest_ok = digest_ok and (k == n) and (tot == want_digest)
    res_dt = statistics.median(res_dts)

    return {"config": "decode_dsv_to_y4m", "frames": n,
            "fps": round(n / our_dt, 3),
            "d28dec_fps": round(n / ref_dt, 3),
            "vs_baseline": round(ref_dt / our_dt, 4), "exact": exact,
            "device_fps": round(n / res_dt, 3),
            "device_vs_d28dec": round(ref_dt / res_dt, 4),
            "resident_digest_ok": digest_ok}


def _pick_platform():
    """The axon TPU tunnel can hang jax initialization when it is down;
    probe it in a disposable subprocess and fall back to CPU so the bench
    always reports a number."""
    if os.environ.get("DSV2_BENCH_FORCE") == "cpu":
        return "cpu"
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
    on_tpu = plat != "cpu"
    if on_tpu:
        w, h, nframes, chunk, metric = 1920, 1080, 32, 8, \
            "fhd_intra_encode_fps"
        p_gop, p_width = P_GOP, P_WIDTH
        extra = {}
    else:
        w, h, nframes, chunk, metric = 352, 288, 64, 16, \
            "cif_intra_encode_fps_cpu"
        p_gop, p_width = P_GOP_CPU, P_WIDTH_CPU
        extra = {"tpu_tunnel_down": True}
    mark("start")
    src = ensure_inputs(w, h, nframes)
    mark("inputs ready")
    # overlap our jit warm (tracing + remote compiles, GIL released on
    # RPC waits) with the reference build + timed C encodes (subprocesses)
    import threading
    warm_err = []

    def _warm():
        try:
            intra_warm(src, chunk)
        except BaseException as e:
            warm_err.append(e)
    wt = threading.Thread(target=_warm)
    wt.start()
    ref_dir = subprocess.run([os.path.join(REPO, "tools", "build_ref.sh")],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    ref_bin = os.path.join(ref_dir, "dsv2")
    mark("ref built")
    # prep for the extras (fixture gen + per-lane reference chunk caches —
    # untimed subprocess/IO work) fills the warm window; every TIMED
    # section below runs with the box otherwise idle
    try:
        p_lockstep(ref_bin, p_gop, p_width, warm_frames=2,
                   groups=2 if on_tpu else 1, prefetch=True)
        if on_tpu:
            p_lockstep(ref_bin, 60, p_width, groups=2, prefetch=True)
            p_lockstep(ref_bin, 250, 4, w=1280, h=720,
                       frames_per_stream=32, groups=2, prefetch=True)
    except Exception as e:
        print(f"# prefetch failed (non-fatal): {e!r}", file=sys.stderr)
    mark("extras prefetched")
    # The tunnel has a stall mode where a remote compile hangs for tens
    # of minutes mid-warm (observed: >20 min at 1.3% CPU). A bench that
    # hangs there emits NO record — worse than a CPU record. Cap the
    # whole TPU headline; on overrun re-exec this script pinned to CPU
    # (fresh process: the axon plugin cannot be torn down in-process).
    headline_cap = min(600.0, max(120.0, BUDGET * 0.6))
    try:
        with metric_cap(headline_cap):
            wt.join()
            if warm_err:
                raise warm_err[0]
            mark("warm joined")
            c_fps = ref_fps(ref_bin, src, nframes, ARGS)
            mark("C headline timed")
            want = open("/tmp/dsv2_bench_ref.dsv", "rb").read()
            fps, exact = our_intra_fps(src, want, nframes, chunk,
                                       warm=False)
            mark("our headline timed")
    except MetricTimeout:
        if on_tpu:
            print(f"# TPU headline exceeded {headline_cap:.0f}s (tunnel "
                  "stall); re-running on CPU", file=sys.stderr)
            os.environ["DSV2_BENCH_FORCE"] = "cpu"
            os.execv(sys.executable,
                     [sys.executable, os.path.abspath(__file__)])
        raise
    rec = {
        "metric": metric,
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / c_fps, 4),
        "exact": exact,
        "extra": extra,
    }
    if not exact:
        rec["vs_baseline_valid"] = False

    # ---- incremental persistence: the record survives anything below
    art_path = None
    if on_tpu:
        art = os.path.join(REPO, "bench_artifacts")
        os.makedirs(art, exist_ok=True)
        ts = time.strftime("%Y%m%dT%H%M%S")
        art_path = os.path.join(art, f"BENCH_tpu_{ts}.json")

    def persist():
        if art_path:
            with open(art_path, "w") as f:
                json.dump(rec, f, indent=1)

    persist()

    # A tunnel-handshake stall (~10 min observed on the first remote
    # compile of a process) or a cold compile set can eat the whole
    # extras budget inside the headline; guarantee the BASELINE-config
    # extras a 480 s floor without unbounding the total wall clock.
    global _T0
    used = time.monotonic() - _T0
    if used > BUDGET - 480:
        _T0 = time.monotonic() - (BUDGET - 480)

    # ---- extras: priority order, each gated on remaining budget and
    # hard-capped (SIGALRM) so one slow extra cannot erase the record
    only = os.environ.get("DSV2_BENCH_ONLY")

    def want_extra(key):
        return only is None or key in only.split(",")

    def run_extra(key, need, cap, fn, tpu_only=False):
        if not want_extra(key) or (tpu_only and not on_tpu):
            return
        if remaining() < need:
            extra[key] = {"skipped": "budget",
                          "remaining_s": round(remaining(), 1)}
            print(f"# {key} skipped: {remaining():.0f}s left < {need}s "
                  "needed", file=sys.stderr)
            persist()
            return
        mark(f"extra {key} start")
        try:
            with metric_cap(min(cap, remaining() - 20)):
                extra[key] = fn()
        except MetricTimeout:
            extra[key] = {"skipped": "metric_cap", "cap_s": cap}
            print(f"# {key} hit its {cap}s cap", file=sys.stderr)
        except Exception as e:
            print(f"# {key} metric failed: {e!r}", file=sys.stderr)
        persist()

    run_extra("device_ms_per_frame", 30, 120,
              lambda: round(device_ms_per_frame(src, chunk), 3))
    # BASELINE config 1 (warm_frames=2 compiles the I + P step shapes
    # without paying a full extra 384-frame pass before the timed runs)
    # groups=2 pipelines two 8-lane batchers (device flush of one group
    # overlaps host phase of the other): measured 29.5 vs 8.1 fps in the
    # same tunnel regime. groups>2 saturates the 1-core host.
    run_extra("p_lockstep", 120, 360,
              lambda: p_lockstep(ref_bin, p_gop, p_width, warm_frames=2,
                                 groups=2 if on_tpu else 1))
    # BASELINE config 2 (generates its own input; independent of whether
    # p_lockstep ran)
    run_extra("decode", 60, 180,
              lambda: decode_fps(ref_dir, p_chunk_input(ref_bin)))
    # BASELINE config 3: Mobile-CIF class, GOP=60, -effort=10 (the
    # default effort IS 10 on both encoders; README.md:181,:208)
    run_extra("mobile_cif", 90, 300,
              lambda: p_lockstep(ref_bin, 60, p_width,
                                 name="cif_gop60_effort10_x8g2", runs=1,
                                 warm_frames=2, groups=2,
                                 pref="/tmp/dsv2_bench_c3.dsv"),
              tpu_only=True)
    # BASELINE config 4: Parkrun-class 1280x720 GOP=250 (qpel + EPRM
    # motion stress; README.md:229). 32 frames x8 streams = 256 frames
    # per side (a full 1000-frame GOP does not fit the bench budget;
    # gop=250 semantics are identical for the frames encoded). Runs
    # before lossless444: it is the config with the thinnest record.
    run_extra("parkrun_720p", 120, 420,
              lambda: p_lockstep(ref_bin, 250, 4, w=1280, h=720,
                                 name="720p_gop250_x4g2_32f", runs=1,
                                 warm_frames=4, frames_per_stream=32,
                                 groups=2,
                                 pref="/tmp/dsv2_bench_c4.dsv"),
              tpu_only=True)
    # BASELINE config 5
    run_extra("lossless444", 90, 300,
              lambda: lossless444_batch(ref_bin), tpu_only=True)
    # diagnostics last: BASELINE configs always outrank them for budget
    run_extra("link_MBps", 20, 60, lambda: round(link_mbps(), 1),
              tpu_only=True)
    # decode_fhd VERY last: an FHD decode chain run once crashed the TPU
    # worker ("kernel fault"); everything above is already persisted if
    # that recurs
    run_extra("decode_fhd", 45, 180, lambda: dict(
        decode_fps(ref_dir, "/tmp/dsv2_bench_ref.dsv"),
        config="decode_fhd_intra_dsv"), tpu_only=True)

    print(json.dumps(rec))
    print(f"# reference C encoder: {c_fps:.2f} fps (same host, same "
          f"config); bench wall {time.monotonic() - _T0:.0f}s",
          file=sys.stderr)
    persist()


if __name__ == "__main__":
    main()
