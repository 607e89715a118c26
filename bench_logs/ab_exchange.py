"""A/B: packed vs unpacked shuffle send layout on real hardware.

Old path (round 1): variadic sort of every column (data+validity packed
inside sort) then per-column UNPACKED data+validity gathers into the
send buffer. New path (321b1ce): the gather and everything after rides
the packed int64 limbs. Run on the chip:

  PYTHONPATH=/root/repo:/root/.axon_site python bench_logs/ab_exchange.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import ballista_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from ballista_tpu.batch import Batch, Column
from ballista_tpu.parallel.shuffle import (_send_layout_packed,
                                           shuffle_dest)

N = 6_000_000
P = 8
QUOTA = (N // P) * 2
rng = np.random.default_rng(0)

# a q3/q10-ish exchange payload: 6 columns of mixed width
cols = []
for dt in (np.int64, np.int64, np.float64, np.int32, np.int32, np.int64):
    cols.append(Column(jnp.asarray(rng.integers(0, 1 << 40, N).astype(dt)),
                       jnp.ones(N, jnp.bool_)))
batch = Batch(tuple(cols), jnp.int32(N))


def new_layout(batch):
    send_ops, unpack, slot_live, send_counts, overflow, counts = \
        _send_layout_packed(batch, [0], P, QUOTA)
    cols = tuple(Column(c.data, c.validity & slot_live)
                 for c in unpack(send_ops))
    return tuple(c.data for c in cols) + (send_counts,)


def old_layout(batch):
    from ballista_tpu.ops.vsort import sort_batch_columns
    dest, live = shuffle_dest(batch, [0], P)
    sorted_batch, _, (sorted_dest,) = sort_batch_columns((dest,), batch)
    dests = jnp.arange(P + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_dest, dests,
                              side="left").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    offsets = starts[:P]
    send_counts = jnp.minimum(counts, QUOTA)
    j = jnp.arange(P * QUOTA, dtype=jnp.int32)
    d_of = j // QUOTA
    k_of = j % QUOTA
    src = jnp.clip(jnp.take(offsets, d_of) + k_of, 0, N - 1)
    slot_live = k_of < jnp.take(send_counts, d_of)
    out = []
    for c in sorted_batch.columns:
        out.append(jnp.take(c.data, src))
        out.append(jnp.take(c.validity, src) & slot_live)
    return tuple(out) + (send_counts,)


def bench(name, fn):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(batch)
    drain = int(np.asarray(out[-1]).sum())  # forced device->host fence
    compile_s = time.time() - t0
    K = 10
    t0 = time.time()
    for _ in range(K):
        out = f(batch)
    drain = int(np.asarray(out[-1]).sum())
    dt = (time.time() - t0) / K
    print(f"{name}: {dt*1000:8.1f} ms/iter (compile {compile_s:.1f}s, "
          f"sent {drain} rows)", flush=True)
    return dt


d_new = bench("packed  ", new_layout)
d_old = bench("unpacked", old_layout)
print(f"speedup: {d_old/d_new:.2f}x")
