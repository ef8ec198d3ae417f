"""Persistent-cache dir layout: per-host fingerprint segregation.

XLA:CPU AOT artifacts embed the build host's machine features; loading
them on a different host logs cpu_aot_loader errors (and can SIGILL).
enable_compilation_cache therefore keys the cache dir by a host CPU
fingerprint so migrated boxes never load each other's artifacts.
"""

import os

from fetal_mri_segmentation_tpu.utils.compilation_cache import (
    _host_fingerprint, enable_compilation_cache)


def test_fingerprint_deterministic_hex():
    fp = _host_fingerprint()
    assert len(fp) == 12
    assert all(c in "0123456789abcdef" for c in fp)
    assert _host_fingerprint() == fp


def test_cache_dir_is_fingerprint_subdir(tmp_path, monkeypatch):
    monkeypatch.delenv("FETAL_TPU_NO_CACHE", raising=False)
    p = enable_compilation_cache(str(tmp_path))
    assert p == os.path.join(str(tmp_path), _host_fingerprint())
    assert os.path.isdir(p)
    # idempotent
    assert enable_compilation_cache(str(tmp_path)) == p
    # re-point jax at the suite-wide default cache so this test doesn't
    # leave later tests writing into tmp_path
    enable_compilation_cache()


def test_no_cache_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("FETAL_TPU_NO_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path)) == ""
    assert not os.path.exists(tmp_path / _host_fingerprint())
