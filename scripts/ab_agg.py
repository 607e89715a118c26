"""On-chip A/B: masked broadcast-reduce vs MXU matmul-agg vs Pallas fused.

Q1-like shapes: n=6M rows, T=4 groups, A=5 int64 sum aggregates + 2 counts.
Times K dispatches then drains with a scalar fetch (axon relay rule).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_agg.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import ballista_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 6_000_000
T = 4
A = 5
K = 10

rng = np.random.default_rng(0)
slot_np = rng.integers(0, T + 1, N).astype(np.int32)  # T = dead
vals_np = [rng.integers(0, 10_000_000, N).astype(np.int64) for _ in range(A)]
live_np = slot_np < T

slot = jnp.asarray(slot_np)
vals = [jnp.asarray(v) for v in vals_np]
live = jnp.asarray(live_np)

# ---- expected (numpy oracle)
exp = np.stack([np.bincount(np.where(live_np, slot_np, T), weights=v.astype(np.float64),
                            minlength=T + 1)[:T] for v in vals_np], axis=1)


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(K):
        out = fn(*args)
    # drain through scalar fetch
    leaves = jax.tree_util.tree_leaves(out)
    s = float(leaves[0].astype(jnp.float64).sum())
    ms = (time.time() - t0) / K * 1000
    got = np.asarray(leaves[0], dtype=np.float64)
    print(f"{name:28s} compile {compile_s:7.1f}s  run {ms:8.2f} ms  "
          f"checksum {s:.6g}")
    return got, ms


results = {}

# 1) masked broadcast reduce (current default)
from ballista_tpu.ops import segagg


@jax.jit
def masked(slot, live, *vals):
    lay = segagg.MaskedLayout(slot, live, T)
    outs = [lay.sum(v, jnp.ones_like(live))[0] for v in vals]
    return jnp.stack(outs, axis=1)


got, ms = timeit("masked broadcast-reduce", masked, slot, live, *vals)
assert np.allclose(got, exp), "masked mismatch"
results["masked"] = ms

# 2) MXU matmul agg
os.environ["BALLISTA_MATMUL_AGG"] = "1"


@jax.jit
def matmul(slot, live, *vals):
    lay = segagg.MaskedLayout(slot, live, T)
    outs = [lay.sum(v, jnp.ones_like(live))[0] for v in vals]
    return jnp.stack(outs, axis=1)


got, ms = timeit("MXU matmul-agg", matmul, slot, live, *vals)
assert np.allclose(got, exp), "matmul mismatch"
results["matmul"] = ms
del os.environ["BALLISTA_MATMUL_AGG"]

# 3) Pallas fused single-pass
from ballista_tpu.ops import pallas_agg


@jax.jit
def pallas(slot, live, *vals):
    eff = jnp.where(live, slot, T)
    masked_vals = [jnp.where(live, v, 0) for v in vals]
    return pallas_agg.fused_masked_sums(eff, masked_vals, T)


try:
    got, ms = timeit("pallas fused", pallas, slot, live, *vals)
    assert np.allclose(got, exp), "pallas mismatch"
    results["pallas"] = ms
except Exception as e:
    print("pallas FAILED:", repr(e)[:500])

print("\nRESULTS:", results)
best = min(results, key=results.get)
print("WINNER:", best)
