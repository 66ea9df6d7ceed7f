"""Persistent-compilation-cache wiring (utils/cache.py)."""

import os

import face_crop_plus_tpu.utils.cache as cache_mod
from face_crop_plus_tpu.utils.cache import default_cache_path, enable_compilation_cache


def _reset():
    cache_mod._DONE = False


def test_disabled_by_knob(monkeypatch):
    _reset()
    monkeypatch.setenv("FCPT_COMPILATION_CACHE", "0")
    assert enable_compilation_cache() is None


def test_cpu_backend_skipped_by_default(monkeypatch):
    """On the CPU backend the cache stays off unless pointed at a dir
    (XLA:CPU AOT entries pin host feature sets)."""
    _reset()
    monkeypatch.delenv("FCPT_COMPILATION_CACHE", raising=False)
    import jax

    if jax.default_backend() != "cpu":  # pragma: no cover - accelerator CI
        return
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # an embedding application configured it; ours never overrides
    assert enable_compilation_cache() is None


def test_explicit_dir_wins_even_on_cpu(tmp_path, monkeypatch):
    _reset()
    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # already configured (returns that) — override path untestable
    target = str(tmp_path / "xla")
    monkeypatch.setenv("FCPT_COMPILATION_CACHE", target)
    try:
        got = enable_compilation_cache()
        assert got == target
        assert os.path.isdir(target)
        # Idempotent: second call returns the configured dir.
        assert enable_compilation_cache() == target
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        _reset()


def test_default_path_under_cache_dir(monkeypatch):
    monkeypatch.setenv("FCPT_CACHE_DIR", "/tmp/fcpt_cache_test")
    assert default_cache_path() == "/tmp/fcpt_cache_test/xla_cache"
