"""Host-runtime tuning helpers (util.sysmem).

malloc_heap_reuse tunes glibc's allocator for repeated day-scale buffers
(no reference analog — microVM pathology, CLAUDE.md "Host-side
pathologies"); enable_persistent_compile_cache makes
``JAX_COMPILATION_CACHE_DIR`` effective and pins single-frame MLIR
locations so the persistent cache key survives caller-side line shifts
(the Mosaic kernel payload embeds locations strip-debuginfo can't
reach).
"""
import os

import jax

from xcorr_tpu.util import sysmem


def test_malloc_heap_reuse_idempotent():
    # returns a bool and must be safe to call repeatedly (every CLI and
    # batch entry point calls it)
    first = sysmem.malloc_heap_reuse()
    second = sysmem.malloc_heap_reuse()
    assert isinstance(first, bool) and isinstance(second, bool)


def test_persistent_cache_disabled_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert sysmem.enable_persistent_compile_cache() is False


def test_persistent_cache_sets_flags(monkeypatch, tmp_path):
    old_dir = jax.config.jax_compilation_cache_dir
    old_locs = jax.config.jax_include_full_tracebacks_in_locations
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
        assert sysmem.enable_persistent_compile_cache() is True
        # the dir is scoped by the jax+jaxlib build: AOT entries embed
        # the compiling build's LLVM target features and the cache key
        # does not cover the build (see sysmem docstring)
        got = jax.config.jax_compilation_cache_dir
        assert os.path.dirname(got) == str(tmp_path)
        assert jax.__version__ in os.path.basename(got)
        # single-frame locations: caller-side line shifts must not
        # rotate the persistent cache key (see sysmem docstring)
        assert jax.config.jax_include_full_tracebacks_in_locations \
            is False
        # opt-out leaves the jax default alone
        jax.config.update("jax_include_full_tracebacks_in_locations",
                          True)
        monkeypatch.setenv("XCORR_CACHE_SHORT_LOCATIONS", "0")
        assert sysmem.enable_persistent_compile_cache() is True
        assert jax.config.jax_include_full_tracebacks_in_locations \
            is True
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_include_full_tracebacks_in_locations",
                          old_locs)
