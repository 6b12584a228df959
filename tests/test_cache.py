"""Persistent-compilation-cache utility (utils/cache.py).

CPU-hermetic: only config behavior is asserted — nothing compiles long
enough on CPU for entries to be written."""

import importlib

import jax
import pytest


_KEYS = ("jax_compilation_cache_dir",
         "jax_persistent_cache_min_compile_time_secs",
         "jax_persistent_cache_min_entry_size_bytes")


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """Later suite tests must not write cache entries into a deleted
    tmp_path (whole-planner CPU compiles exceed the 1 s threshold) nor
    inherit the lowered compile-time/entry-size thresholds."""
    prev = {k: getattr(jax.config, k) for k in _KEYS}
    yield
    for k, v in prev.items():
        jax.config.update(k, v)


def _fresh(monkeypatch, tmp_path, env=None):
    import mfgp_tpu.utils.cache as cache

    importlib.reload(cache)
    if env is None:
        monkeypatch.delenv(cache._ENV, raising=False)
    else:
        monkeypatch.setenv(cache._ENV, env)
    return cache


def test_enable_sets_config_and_is_idempotent(monkeypatch, tmp_path):
    cache = _fresh(monkeypatch, tmp_path)
    d = str(tmp_path / "xla")
    assert cache.enable_compilation_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    # second call (even with a different dir) keeps the first
    assert cache.enable_compilation_cache(str(tmp_path / "other")) == d


def test_env_opt_out(monkeypatch, tmp_path):
    cache = _fresh(monkeypatch, tmp_path, env="0")
    assert cache.enable_compilation_cache(str(tmp_path / "xla")) is None


def test_env_overrides_location(monkeypatch, tmp_path):
    d = str(tmp_path / "envdir")
    cache = _fresh(monkeypatch, tmp_path, env=d)
    assert cache.enable_compilation_cache() == d


def test_empty_platform_fails_closed_when_axon_importable(monkeypatch,
                                                          tmp_path):
    """With no platform configured, jax auto-discovers plugins; if the
    axon plugin is importable it wins, so the gate must fail closed."""
    import importlib.util as ilu

    cache = _fresh(monkeypatch, tmp_path)
    prev = jax.config.jax_platforms
    jax.config.update("jax_platforms", "")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv(cache._FORCE_ENV, raising=False)
    real_find = ilu.find_spec
    try:
        monkeypatch.setattr(ilu, "find_spec",
                            lambda n: object() if n == "axon"
                            else real_find(n))
        assert cache.enable_compilation_cache(str(tmp_path / "a")) is None
        monkeypatch.setattr(ilu, "find_spec",
                            lambda n: None if n == "axon"
                            else real_find(n))
        d = str(tmp_path / "b")
        assert cache.enable_compilation_cache(d) == d
    finally:
        jax.config.update("jax_platforms", prev)


def test_axon_tunnel_gate(monkeypatch, tmp_path):
    """The axon plugin cannot deserialize executables — a cache hit hangs
    the launch — so the cache must stay off there unless forced."""
    cache = _fresh(monkeypatch, tmp_path)
    prev = jax.config.jax_platforms
    jax.config.update("jax_platforms", "")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv(cache._FORCE_ENV, raising=False)
    try:
        assert cache.enable_compilation_cache(str(tmp_path / "x")) is None
        monkeypatch.setenv(cache._FORCE_ENV, "1")
        d = str(tmp_path / "forced")
        assert cache.enable_compilation_cache(d) == d
    finally:
        jax.config.update("jax_platforms", prev)
