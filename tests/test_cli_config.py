import io
import subprocess
import sys

import pytest

from ballista_tpu.config import (BALLISTA_SHUFFLE_PARTITIONS, BallistaConfig)


def test_config_defaults_and_validation():
    cfg = BallistaConfig()
    assert cfg.shuffle_partitions() == 16
    assert cfg.batch_size() == 8192
    cfg.set(BALLISTA_SHUFFLE_PARTITIONS, "8")
    assert cfg.shuffle_partitions() == 8
    with pytest.raises(KeyError):
        cfg.set("ballista.nope", "1")
    with pytest.raises(ValueError):
        cfg.set(BALLISTA_SHUFFLE_PARTITIONS, "eight")
    opts = cfg.to_dist_options()
    assert opts.n_partitions == 8


def test_cli_one_shot(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "ballista_tpu.cli", "--sf", "0.001",
         "-c", "select count(*) as n from region", "--format", "csv"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo",
             "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache_cpu",
             "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "n" in out.stdout and "5" in out.stdout
