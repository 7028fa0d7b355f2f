#!/usr/bin/env python
"""On-chip kernel parity record: encode fixtures on the REAL TPU with the
Pallas device backends and byte-compare against the reference C binary.

The test suite's Pallas coverage runs in interpret mode on nano fixtures;
round 3 found three Mosaic lowering bug classes that only manifest on the
real chip, so this produces the committed artifact the suite structurally
cannot: a per-backend x per-fixture cmp-clean log from actual hardware
(bench_artifacts/PARITY_tpu_<ts>.log).

Each case runs in its own subprocess (a wedged tunnel step must not take
down the rest). Covers intra + P (gop), effort ladder, odd dims, chroma
formats, and both device HME backends (pallas, gang).

usage: tools/tpu_parity.py [--quick]
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "bench_artifacts")
PY = sys.executable
FIX = os.path.join(REPO, "tests", "fixtures")

CASES = [
    # (name, fixture, extra flags)
    ("cif_intra", "cif352x288_420_12f.y4m", ["-qp=60", "-gop=0"]),
    ("cif_p_gop12", "cif352x288_420_12f.y4m", ["-qp=60", "-gop=12"]),
    ("cif_p_effort10", "cif352x288_420_12f.y4m",
     ["-qp=60", "-gop=12", "-effort=10"]),
    ("odd_p", "odd100x62_420_4f.y4m", ["-qp=60", "-gop=4"]),
    ("tiny422_p", "tiny64x48_422_4f.y4m", ["-qp=40", "-gop=4"]),
    ("tiny410_p", "tiny64x48_410_4f.y4m", ["-qp=40", "-gop=4"]),
]
QUICK = [c for c in CASES if c[0] in ("cif_p_gop12", "odd_p")]


def main():
    quick = "--quick" in sys.argv
    os.makedirs(ART, exist_ok=True)
    ref_dir = subprocess.run([os.path.join(REPO, "tools", "build_ref.sh")],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    ref_bin = os.path.join(ref_dir, "dsv2")
    ts = time.strftime("%Y%m%dT%H%M%S")
    log_path = os.path.join(ART, f"PARITY_tpu_{ts}.log")
    log = open(log_path, "w")

    def emit(line):
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    # bounded tunnel probe
    probe = subprocess.run(
        [PY, "-c", "import jax; print(jax.devices())"],
        capture_output=True, text=True, timeout=240)
    if probe.returncode != 0:
        emit(f"TUNNEL DOWN: {probe.stderr.strip()[-200:]}")
        sys.exit(1)
    emit(f"# on-chip parity session {ts}: {probe.stdout.strip()}")

    cases = QUICK if quick else CASES
    fails = 0
    for name, fixture, flags in cases:
        src = os.path.join(FIX, fixture)
        ref_out = f"/tmp/parity_ref_{name}.dsv"
        subprocess.run([ref_bin, "e", "-y", "-inp=" + src,
                        "-out=" + ref_out, "-y4m=1"] + flags,
                       capture_output=True, check=True)
        want = open(ref_out, "rb").read()
        for backend in ("pallas", "gang"):
            our_out = f"/tmp/parity_{backend}_{name}.dsv"
            env = dict(os.environ, DSV2_HME=backend)
            t0 = time.time()
            p = subprocess.run(
                [PY, "-m", "dsv2_tpu", "e", "-y", "-inp=" + src,
                 "-out=" + our_out, "-y4m=1"] + flags,
                capture_output=True, text=True, timeout=1800, env=env,
                cwd=REPO)
            dt = time.time() - t0
            if p.returncode != 0:
                emit(f"FAIL {name:16s} {backend:7s} rc={p.returncode} "
                     f"({dt:.0f}s): {p.stderr.strip()[-300:]}")
                fails += 1
                continue
            got = open(our_out, "rb").read()
            ok = got == want
            emit(f"{'OK  ' if ok else 'DIFF'} {name:16s} {backend:7s} "
                 f"{len(want)} bytes ({dt:.0f}s)")
            fails += 0 if ok else 1
    emit(f"# done: {fails} failures / {2 * len(cases)} runs")
    log.close()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
