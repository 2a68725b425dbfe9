"""Device ops package.

Configures the persistent XLA compilation cache on import: the axon
remote-compile path costs tens of seconds per kernel shape, so executables
are cached across processes (FFVVC_JAX_CACHE overrides the location).
"""
import os

def _cache_key() -> str:
    """CPU AOT cache entries are machine-feature specific and sessions hop
    hosts (feature-mismatch → SIGILL risk), so key the cache dir on the
    host's CPU flags."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


try:
    import jax
    # the persistent cache exists for the tunneled-chip path (remote
    # compiles cost tens of seconds); on the forced-CPU backend (tests,
    # virtual meshes) CPU compiles are fast and CPU AOT entries carry the
    # machine-feature-mismatch hazard — observed as a deterministic
    # SIGSEGV deserializing an entry mid-suite — so skip the cache there
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        _cache_dir = os.environ.get(
            "FFVVC_JAX_CACHE",
            os.path.expanduser("~/.ffvvc_jax_cache-" + _cache_key()))
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
