import os
import sys

# Tests run on a virtual 8-device CPU mesh (the real-chip path is exercised
# by bench.py / the driver).  The axon sitecustomize imports jax at
# interpreter start and pins the platform before conftest can set env vars,
# so re-exec pytest once with a clean environment (axon site dropped,
# platform forced to CPU).
_NEED_REEXEC = ("jax" in sys.modules
                and os.environ.get("FFVVC_TEST_REEXEC") != "1")


def pytest_configure(config):
    # The re-exec must happen from a hook, not at conftest import time:
    # pytest's global fd capture is already active when conftests load, so
    # an execv there hands the child pytest the *captured* fds and every
    # byte of test output silently disappears into a deleted temp file.
    # Suspend capture (restoring the real fds 1/2) before exec'ing.
    if not _NEED_REEXEC:
        return
    os.environ["FFVVC_TEST_REEXEC"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8"
                               ).strip()
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])


if _NEED_REEXEC:
    # Re-exec happens in pytest_configure below; skip the platform pins so
    # the about-to-die parent doesn't touch jax state.
    pass
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

ORACLE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".refbuild", "ffmpeg")


def have_oracle():
    return os.path.exists(ORACLE)


@pytest.fixture
def oracle_path():
    if not have_oracle():
        pytest.skip("reference oracle not built (.refbuild/ffmpeg)")
    return ORACLE


def oracle_decode(stream: bytes, tmp_path) -> bytes:
    """Decode Annex-B bytes with the reference decoder; returns raw YUV.
    -flags unaligned makes conformance-window cropping exact (FATE does the
    same, reference tests/fate/vvc.mak:41)."""
    import subprocess
    bit = tmp_path / "t.bit"
    yuv = tmp_path / "t.yuv"
    bit.write_bytes(stream)
    r = subprocess.run(
        [ORACLE, "-hide_banner", "-loglevel", "error", "-threads", "1",
         "-flags", "unaligned",
         "-f", "vvc", "-i", str(bit), "-f", "rawvideo", "-y", str(yuv)],
        capture_output=True, timeout=120)
    assert r.returncode == 0 and not r.stderr, r.stderr.decode()
    return yuv.read_bytes()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process XLA/LLVM compiler state: after ~200 tests of
    accumulated compilations the CPU backend_compile segfaults
    deterministically on one more BDOF-solve HLO (history-dependent
    compiler crash — every file pair passes, only the full sequence
    trips it).  Clearing jit caches at module boundaries keeps the
    compiler state bounded; the cost is per-file recompiles."""
    yield
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass
