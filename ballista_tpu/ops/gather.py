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

Reference role: DataFusion's `take` kernels under HashJoinExec output
materialization (Ballista delegates join compute to DataFusion,
SURVEY.md §1 engine-kernel note).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Column

_WBITS = 63  # usable validity bits per int64 word (avoid the sign bit)


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

    out64 = jnp.take(jnp.stack(slots64, axis=1), idx, axis=0, mode="clip")
    out32 = (jnp.take(jnp.stack(slots32, axis=1), idx, axis=0, mode="clip")
             if slots32 else None)
    outf = (jnp.take(jnp.stack(slotsf, axis=1), idx, axis=0, mode="clip")
            if slotsf else None)

    def bit(i: int) -> jax.Array:
        w, o = divmod(i, _WBITS)
        return ((out64[:, ndata64 + w] >> o) & 1).astype(jnp.bool_)

    out: List[Column] = []
    for (cls, slot, cast, vbit) in plan:
        valid = bit(vbit)
        if valid_and is not None:
            valid = valid & valid_and
        if cls == "bit":
            data = bit(slot)
        elif cls == "w64":
            data = out64[:, slot]
        elif cls == "wf":
            data = outf[:, slot]
        else:
            data = out32[:, slot]
            if cast is not None:
                data = jax.lax.bitcast_convert_type(data, cast)
        out.append(Column(data, valid))
    return out
