"""Packed row-gather: fetch many columns through ONE shared index vector.

Measured on v5e (6M indices): a single-column `jnp.take` costs ~90 ms
regardless of dtype — it is latency-bound, one transaction per element.
Gathering rows of a stacked (n, k) matrix moves k values per transaction:
8 int64 columns cost 91 ms as one 2D row-gather vs 644 ms as 8 separate
takes (7x), int32 halves that again. So join materialization packs all
columns of a side into per-byte-width matrices (int64/f64 bitcast into
one, int32/f32 into another), packs the validity bools (and bool data
columns) into bitmask words appended to the int64 matrix, gathers each
matrix once, and unpacks.

HARD CONSTRAINT (found via bench_logs/sf10_r3.log:18 and the AOT layout
probes, round 5): XLA TPU lays a gather's (N, k) output out as
{1,0:T(8,128)} — the k<=8 minor dim pads to 128 LANES, so the output
buffer costs N*128*elem bytes regardless of k (43.85 GB at the SF10
join capacity 85,649,664 — the q5/q8 compile-time OOM). The fix keeps
the row-locality win but bounds the padded buffer: gathers whose padded
output exceeds BALLISTA_GATHER_PAD_CAP (default 1 GiB) run as a
lax.scan over row chunks, each chunk doing one stacked gather into a
bounded scratch and emitting per-column 1-D slices (compact layouts).

Reference role: DataFusion's `take` kernels under HashJoinExec output
materialization (Ballista delegates join compute to DataFusion,
SURVEY.md §1 engine-kernel note).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Column

_WBITS = 63  # usable validity bits per int64 word (avoid the sign bit)


def _pad_cap() -> int:
    return int(float(os.environ.get("BALLISTA_GATHER_PAD_CAP",
                                    str(1 << 30))))


def _take_rows(stack: jax.Array, idx: jax.Array) -> List[jax.Array]:
    """Row-gather `stack[(n_rows, k)]` by `idx`, returning k per-column
    1-D arrays. Single stacked take when the padded (N, k->128-lane)
    output fits the cap; chunked scan otherwise (same inner stacked
    gather, bounded scratch, compact outputs)."""
    n = idx.shape[0]
    k = stack.shape[1]
    # a 64-bit stack's pair representation still pads the PAIR dim into
    # lanes with the k dim, so padded bytes ~ N*128*elem either way
    elem = stack.dtype.itemsize
    padded = n * 128 * elem
    cap = _pad_cap()
    if padded <= cap or n <= (1 << 16):
        out = jnp.take(stack, idx, axis=0, mode="clip")
        return [out[:, j] for j in range(k)]
    m = max(cap // (128 * elem), 1 << 16)
    nchunks = -(-n // m)
    idx_p = jnp.pad(idx, (0, nchunks * m - n)).reshape(nchunks, m)

    def body(_, ic):
        blk = jnp.take(stack, ic, axis=0, mode="clip")   # bounded scratch
        return None, tuple(blk[:, j] for j in range(k))

    _, ys = jax.lax.scan(body, None, idx_p)   # k arrays of (nchunks, m)
    return [y.reshape(-1)[:n] for y in ys]


def gather_columns(cols: Sequence[Column], idx: jax.Array,
                   valid_and: Optional[jax.Array] = None) -> List[Column]:
    """Gather rows `idx` of every column; at most one 2D gather per
    byte-width class. `valid_and` (same shape as idx) is ANDed into every
    output validity (the caller's matched/live mask)."""
    if not cols:
        return []

    slots64: List[jax.Array] = []     # int64 data arrays
    slotsf: List[jax.Array] = []      # float64 data arrays (own stack:
    # the axon remote compiler's x64-removal rewrite cannot lower
    # bitcast-convert on 64-bit types, so f64 never views as s64)
    slots32: List[jax.Array] = []     # int32-viewed data arrays
    bit_arrays: List[jax.Array] = []  # bools packed into bitmask words
    plan = []                         # (cls, slot_or_bit, orig_dtype, vbit)
    for c in cols:
        d = c.data
        if d.dtype == jnp.bool_:
            plan.append(("bit", len(bit_arrays), None, len(bit_arrays) + 1))
            bit_arrays.append(d)
        elif d.dtype.itemsize == 8:
            if d.dtype == jnp.int64:
                plan.append(("w64", len(slots64), None, len(bit_arrays)))
                slots64.append(d)
            else:
                plan.append(("wf", len(slotsf), None, len(bit_arrays)))
                slotsf.append(d)
        else:
            cast = None if d.dtype == jnp.int32 else d.dtype
            plan.append(("w32", len(slots32), cast, len(bit_arrays)))
            slots32.append(d if cast is None
                           else jax.lax.bitcast_convert_type(d, jnp.int32))
        bit_arrays.append(c.validity)

    nwords = (len(bit_arrays) + _WBITS - 1) // _WBITS
    ndata64 = len(slots64)
    for w in range(nwords):
        chunk = bit_arrays[w * _WBITS:(w + 1) * _WBITS]
        word = chunk[0].astype(jnp.int64)
        for i, b in enumerate(chunk[1:], start=1):
            word = word | (b.astype(jnp.int64) << i)
        slots64.append(word)

    out64 = _take_rows(jnp.stack(slots64, axis=1), idx)
    out32 = _take_rows(jnp.stack(slots32, axis=1), idx) if slots32 else None
    outf = _take_rows(jnp.stack(slotsf, axis=1), idx) if slotsf else None

    def bit(i: int) -> jax.Array:
        w, o = divmod(i, _WBITS)
        return ((out64[ndata64 + w] >> o) & 1).astype(jnp.bool_)

    out: List[Column] = []
    for (cls, slot, cast, vbit) in plan:
        valid = bit(vbit)
        if valid_and is not None:
            valid = valid & valid_and
        if cls == "bit":
            data = bit(slot)
        elif cls == "w64":
            data = out64[slot]
        elif cls == "wf":
            data = outf[slot]
        else:
            data = out32[slot]
            if cast is not None:
                data = jax.lax.bitcast_convert_type(data, cast)
        out.append(Column(data, valid))
    return out
