"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; unit and
parity tests must be hermetic and fast, and multi-chip sharding is validated
on the virtual CPU mesh per the project conventions.
"""
import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (before any dsv2_tpu module pulls it in)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dsv2_tpu  # noqa: E402

# The suite was compile-bound without this: the per-module clear_caches()
# below (XLA:CPU segfault workaround) forced full recompiles of the big
# chain/wave programs on every run. With the persistent cache, cleared
# executables deserialize in milliseconds instead.
dsv2_tpu.enable_compile_cache()
# Persist sub-second compiles too: the suite compiles hundreds of small
# programs, and the default 1 s threshold makes every run redo them.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import gc  # noqa: E402

import pytest  # noqa: E402

# Tracing the big XLA programs allocates millions of objects; CPython's
# gen-2 collections rescan every live object, so collection cost grows
# with suite progress (measured: test_parallel 119 s standalone vs 271 s
# late in the suite; still 1.5x with raised thresholds). Automatic
# collection is disabled outright — the explicit per-module collect
# below bounds cycle garbage (peak suite RSS ~8 GB on a 128 GB box).
gc.disable()
gc.freeze()


@pytest.fixture(autouse=(os.environ.get("DSV2_TEST_KEEP_CACHES", "") == ""),
                scope="module")
def _reset_jax_caches():
    """Drop compiled executables between test modules: the XLA:CPU JIT
    accumulates per-process state and has been observed to segfault after
    several hundred in-process compilations (late test_sbt cases only when
    the full suite runs in one process)."""
    yield
    jax.clear_caches()
    gc.collect()  # explicit collection works with the collector disabled
    gc.freeze()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")


@pytest.fixture(scope="session")
def ref_build():
    """Build the reference oracle (binary + .so + conformance decoder)."""
    out = subprocess.run(
        [os.path.join(REPO, "tools", "build_ref.sh")],
        check=True, capture_output=True, text=True).stdout.strip()
    return out


@pytest.fixture(scope="session")
def fixtures_dir():
    if not os.path.exists(os.path.join(FIXTURES, "nano48x32_420_4f.y4m")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "mkfixtures.py"),
                        FIXTURES], check=True)
    return FIXTURES
