"""Diagnose persistent-compile-cache determinism (VERDICT r2 item 2).

Runs one TPC-H query's full compile path in-process with
JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache so every persistent-cache
get/put logs its key. Run this twice in fresh processes against the same
cache dir: a deterministic pipeline logs 100% hits on the second run.

Usage: python scripts/diag_cache.py <query> [sf]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("BALLISTA_TPCH_CACHE", "/tmp/tpch_cache")
os.environ.setdefault("JAX_DEBUG_LOG_MODULES", "jax._src.compilation_cache")

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the env's sitecustomize registers axon and captures JAX_PLATFORMS
    # before we run — override through the config API (as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DIAG_CACHE_DIR", "/tmp/jax_cache_diag"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ballista_tpu.client import SessionContext  # noqa: E402
from ballista_tpu.client.context import _rebind_scans  # noqa: E402
from ballista_tpu.datagen import generate_tpch, register_tpch  # noqa: E402
from ballista_tpu.planner.optimizer import prune_columns  # noqa: E402
from ballista_tpu.benchmarks.queries import TPCH_QUERIES  # noqa: E402

q = int(sys.argv[1]) if len(sys.argv) > 1 else 1
sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01

ctx = SessionContext(capacity_mode="bucket")
data = generate_tpch(sf)
register_tpch(ctx, sf, data=data)
plan = _rebind_scans(prune_columns(ctx.sql(TPCH_QUERIES[q]).plan), ctx)
fn, inputs, ep, out = ctx.converge_compile(plan, pruned=True)
print(f"q{q} rows={int(out.num_rows)}", file=sys.stderr)
