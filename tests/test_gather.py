"""ops/gather.py: packed row-gather correctness, including the chunked
path that bounds the TPU's (N, k)->128-lane padded gather output (the
SF10 q5/q8 compile-OOM fix — see gather.py docstring and
bench_logs/sf10_r3.log:18)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ballista_tpu.batch import Column
from ballista_tpu.ops.gather import _take_rows, gather_columns


def _mk_cols(rng, nb):
    return [
        Column(jnp.asarray(rng.integers(-5, 5, nb, endpoint=True)
                           .astype(np.int64) << 33),
               jnp.asarray(rng.random(nb) < 0.8)),
        Column(jnp.asarray(rng.integers(0, 100, nb).astype(np.int32)),
               jnp.asarray(rng.random(nb) < 0.9)),
        Column(jnp.asarray(rng.random(nb).astype(np.float64)),
               jnp.asarray(np.ones(nb, bool))),
        Column(jnp.asarray(rng.random(nb) < 0.5),
               jnp.asarray(rng.random(nb) < 0.7)),
        Column(jnp.asarray(rng.random(nb).astype(np.float32)),
               jnp.asarray(rng.random(nb) < 0.6)),
    ]


def _check(cols, idx, out, valid_and=None):
    for c, o in zip(cols, out):
        want_d = np.asarray(c.data)[np.clip(idx, 0, len(np.asarray(c.data))
                                            - 1)]
        want_v = np.asarray(c.validity)[np.clip(
            idx, 0, len(np.asarray(c.validity)) - 1)]
        if valid_and is not None:
            want_v = want_v & valid_and
        got_v = np.asarray(o.validity)
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(np.asarray(o.data)[got_v],
                                      want_d[got_v])


def test_gather_columns_all_families():
    rng = np.random.default_rng(0)
    nb, n = 37, 501
    cols = _mk_cols(rng, nb)
    idx = rng.integers(0, nb, n).astype(np.int32)
    mask = rng.random(n) < 0.8
    out = gather_columns(cols, jnp.asarray(idx), jnp.asarray(mask))
    _check(cols, idx, out, mask)


def test_chunked_gather_matches_single(monkeypatch):
    """Force the chunked-scan path with a tiny pad cap; results must be
    bit-identical to the single stacked take."""
    monkeypatch.setenv("BALLISTA_GATHER_PAD_CAP", "1024")
    rng = np.random.default_rng(1)
    nb = 64
    # n above the 1<<16 small-gather floor so the cap actually bites
    n = (1 << 16) + 777
    cols = _mk_cols(rng, nb)
    idx = rng.integers(0, nb, n).astype(np.int32)
    out = gather_columns(cols, jnp.asarray(idx))
    _check(cols, idx, out)


@pytest.mark.parametrize("k", [1, 2, 5])
def test_take_rows_chunked_equals_dense(monkeypatch, k):
    rng = np.random.default_rng(2)
    nb, n = 29, (1 << 16) + 13
    stack = rng.integers(-(2 ** 40), 2 ** 40, (nb, k)).astype(np.int64)
    idx = rng.integers(0, nb, n).astype(np.int32)
    monkeypatch.setenv("BALLISTA_GATHER_PAD_CAP", str(1 << 40))
    dense = _take_rows(jnp.asarray(stack), jnp.asarray(idx))
    monkeypatch.setenv("BALLISTA_GATHER_PAD_CAP", "4096")
    chunked = _take_rows(jnp.asarray(stack), jnp.asarray(idx))
    assert len(dense) == len(chunked) == k
    for d, c in zip(dense, chunked):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(c))
