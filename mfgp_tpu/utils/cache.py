"""Persistent XLA compilation cache for TPU entry points.

Every TPU program in this image compiles through the axon tunnel, where a
single large executable (a study fit sweep, the one-launch planner, a
whole-mission program) takes minutes to build. The reference has no
compilation at all (pure NumPy), so cold-compile latency is a cost the
rebuild introduces — and JAX's persistent compilation cache removes it for
every run after the first: compiled executables are serialized to disk
keyed by the HLO fingerprint, so repeated studies, benches, served
planners, and mission launches skip straight to execution.

**Tunnel-backend caveat (measured):** the axon remote-TPU plugin in this
image hooks ``serialize_executable`` only — ``deserialize_executable`` has
no round-trip (``/root/.axon_site/axon/register/ifrt.py`` documents
"serialize→parse only"). Entries are written fine, but a cache HIT hangs
the first call (>590 s before timeout, vs ~389 s for the same program's
cold compile). The cache is therefore OFF by default when the ``axon``
platform is configured; everywhere else (real TPU hosts, CPU, GPU) it is
on. ``MFGP_TPU_COMPILE_CACHE_FORCE=1`` overrides the gate.

Probed end-to-end in r4 (``tools/aot_export_probe.py``, measured on the
tunnel): ``jax.experimental.serialize_executable`` round-trips and the
deserialized executable RUNS with the correct result, but the load takes
~623 s in a fresh process where the same function cold-compiles and runs
in 2.7 s — the documented hang, eventually completing. ``jax.export``
round-trips StableHLO fine but recompiles on call (trace cache only).
So AOT serialization is a pessimization on this backend and the gate
stands; the compile-latency mitigation is the LONG-LIVED PROCESS
(``serve.py`` PlannerService/ModelRouter/MissionService — `cli mission
--submit URL` reuses a warm whole-mission executable across
submissions).

Opt-out via ``MFGP_TPU_COMPILE_CACHE=0``; override the location with
``MFGP_TPU_COMPILE_CACHE=/path``. Default location: ``~/.cache/mfgp_tpu/xla``.

Enabled by the CLI, ``bench.py``, and ``serve.py`` at startup. Tests do
not enable it (CPU compiles are fast and hermetic runs should not touch
``~/.cache``).
"""

from __future__ import annotations

import os

_ENV = "MFGP_TPU_COMPILE_CACHE"
_FORCE_ENV = "MFGP_TPU_COMPILE_CACHE_FORCE"
_enabled_dir: str | None = None


def _backend_supports_executable_cache() -> bool:
    """False on the axon tunnel plugin: its IFRT client never hooks
    deserialize_executable, so loading a cached executable stalls the
    launch instead of skipping the compile.

    Fails CLOSED when the platform cannot be determined: with no
    explicit platform selection, jax auto-discovers plugins, and if the
    axon plugin is importable it will be picked — enabling the cache
    there reintroduces the >590 s hang the gate exists to prevent."""
    if os.environ.get(_FORCE_ENV) == "1":
        return True
    import jax

    plats = (jax.config.jax_platforms or
             os.environ.get("JAX_PLATFORMS", ""))
    if "axon" in plats:
        return False
    if plats:
        return True
    # Platform unspecified: jax will auto-discover. If the axon plugin is
    # on the path it wins the discovery, so treat "axon importable" as
    # "axon active" rather than initializing the backend to ask (a
    # tunnel attach takes minutes).
    import importlib.util

    return importlib.util.find_spec("axon") is None


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Idempotent.

    Returns the cache directory in use, or None when disabled
    (``MFGP_TPU_COMPILE_CACHE=0``), when the configured backend cannot
    load cached executables (axon tunnel), or when unsupported by the
    installed jax.
    """
    global _enabled_dir
    env = os.environ.get(_ENV, "")
    if env == "0":
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    if not _backend_supports_executable_cache():
        return None
    cache_dir = cache_dir or env or os.path.expanduser(
        "~/.cache/mfgp_tpu/xla")
    import jax

    prev_dir = jax.config.jax_compilation_cache_dir
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took >=1s to compile (tunnel compiles are
        # minutes; 1s keeps CPU-side helper programs out of the cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (AttributeError, ValueError, OSError):
        # roll back so the returned "disabled" matches real config state
        # (a later key may be missing on older jax after the dir was set)
        try:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
        except (AttributeError, ValueError):
            pass
        return None
    _enabled_dir = cache_dir
    return cache_dir
