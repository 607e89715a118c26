"""Scatter-free segment aggregation strategies.

Motivation (measured on TPU v5e, 6M rows): XLA scatter-add costs
450-880 ms per column, while 8 fused masked reductions cost 10 ms and a
full sort 30 ms. Aggregation therefore avoids scatters entirely:

- MaskedLayout (small static group count): group slot = direct composite
  of dictionary codes (strides from dictionary sizes — the hash table
  disappears); each aggregate is T fused masked reductions on the VPU.
  Exact int64, ~10 ms for all of TPC-H Q1's aggregates combined.
- SortedLayout (large/unknown group count): one shared argsort groups
  equal keys into runs; per-aggregate = gather + cumsum + two small
  gathers at run boundaries (segmented scan for min/max). Dense run ids
  replace sparse table slots, so the output is already compacted.

These replaced the original scatter-based seg_* kernels (ops/agg.py,
removed in round 5 once the sorted/masked layouts became the only path).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..batch import Column

# Masked-reduce is profitable while XLA fuses the passes; beyond this many
# slots fall back to the sorted layout.
MASKED_MAX = 64
# Direct composite slots are used when the static product of key bounds
# fits; beyond it, keys are sorted instead.
DIRECT_MAX = 1 << 20


def _matmul_seg_sum(row_slot: jax.Array, contrib: jax.Array, T: int):
    """Exact int64 segment sums as an int8 one-hot matmul on the MXU.

    The (T, n) masked broadcast-reduce reads every contribution T times
    (~48B/row at T=6); this reads it once: the value splits into ten
    7-bit int8 limbs (|limb| <= 127 so n <= 2^24 rows per dot keeps the
    int32 accumulator exact), one int8 dot_general against the (n, T)
    one-hot hits the MXU, and the (T, 10) int32 limb sums recombine in
    uint64 (mod-2^64 wraparound makes signed sums exact). Rows with
    slot >= T (dead) fall out of the one-hot."""
    n = contrib.shape[0]
    v = contrib.astype(jnp.int64).astype(jnp.uint64)
    limbs = jnp.stack([((v >> (7 * l)) & 0x7F).astype(jnp.int8)
                       for l in range(10)], axis=1)        # (n, 10)
    gids = jnp.arange(T, dtype=jnp.int32)
    CHUNK = 1 << 24
    if n <= CHUNK:
        oh = (row_slot[:, None] == gids[None, :]).astype(jnp.int8)
        acc = jax.lax.dot_general(oh, limbs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.int64)[None]
    else:
        pad = (-n) % CHUNK
        slot_p = jnp.pad(row_slot, (0, pad), constant_values=T)
        limbs_p = jnp.pad(limbs, ((0, pad), (0, 0)))
        def body(carry, xs):
            s, lm = xs
            oh = (s[:, None] == gids[None, :]).astype(jnp.int8)
            part = jax.lax.dot_general(oh, lm, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            return carry + part.astype(jnp.int64), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((T, 10), jnp.int64),
            (slot_p.reshape(-1, CHUNK), limbs_p.reshape(-1, CHUNK, 10)))
        acc = acc[None]
    acc = acc[0]
    tot = jnp.zeros(T, jnp.uint64)
    for l in range(10):
        tot = tot + (acc[:, l].astype(jnp.uint64) << (7 * l))
    return tot.astype(jnp.int64)


def _matmul_seg_count(row_slot: jax.Array, mask: jax.Array, T: int):
    """Per-slot row counts as one int8 one-hot matmul (see _matmul_seg_sum)."""
    n = row_slot.shape[0]
    gids = jnp.arange(T, dtype=jnp.int32)
    slot = jnp.where(mask, row_slot, T)
    ones = jnp.ones((n, 1), jnp.int8)
    CHUNK = 1 << 24
    if n <= CHUNK:
        oh = (slot[:, None] == gids[None, :]).astype(jnp.int8)
        acc = jax.lax.dot_general(oh, ones, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc[:, 0].astype(jnp.int64)
    pad = (-n) % CHUNK
    slot_p = jnp.pad(slot, (0, pad), constant_values=T)
    def body(carry, s):
        oh = (s[:, None] == gids[None, :]).astype(jnp.int8)
        part = jax.lax.dot_general(
            oh, jnp.ones((CHUNK, 1), jnp.int8), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return carry + part[:, 0].astype(jnp.int64), None
    acc, _ = jax.lax.scan(body, jnp.zeros((T,), jnp.int64),
                          slot_p.reshape(-1, CHUNK))
    return acc


def _use_matmul_agg() -> bool:
    import os
    return os.environ.get("BALLISTA_MATMUL_AGG", "0") == "1"


class MaskedLayout(NamedTuple):
    row_slot: jax.Array      # (n,) int32 in [0, T); dead rows -> T
    live: jax.Array          # (n,) bool
    T: int

    # All reductions use the broadcast form sum(where(slot==g, x, 0), axis=1)
    # over a (T, n) fused generator — XLA keeps it in-register, ~15 ms for
    # 10 int64 aggregates x 12 groups at 6M rows. The unrolled per-group
    # loop form produced 10x slower code AND minutes of extra compile time.
    # BALLISTA_MATMUL_AGG=1 switches integer sums/counts to the MXU
    # one-hot limb matmul (_matmul_seg_sum), which reads each value once
    # instead of T times.

    def _onehot(self):
        gids = jnp.arange(self.T, dtype=jnp.int32)
        return self.row_slot[None, :] == gids[:, None]

    def sum(self, values, validity):
        active = self.live & validity
        v = jnp.where(active, values, jnp.zeros((), values.dtype))
        cnt = self.count(values, validity)[0]
        if _use_matmul_agg() and jnp.issubdtype(values.dtype, jnp.integer):
            out = _matmul_seg_sum(self.row_slot, v, self.T)
            return out.astype(values.dtype), cnt > 0
        # barrier: without it XLA re-evaluates the (often expensive decimal)
        # contribution expression inside the (T, n) reduce generator T times
        v = jax.lax.optimization_barrier(v)
        out = jnp.sum(jnp.where(self._onehot(), v[None, :],
                                jnp.zeros((), v.dtype)), axis=1)
        return out, cnt > 0

    def _count_mask(self, mask):
        if _use_matmul_agg():
            out = _matmul_seg_count(self.row_slot, mask, self.T)
            return out, jnp.ones(self.T, dtype=jnp.bool_)
        active = jax.lax.optimization_barrier(mask.astype(jnp.int64))
        out = jnp.sum(jnp.where(self._onehot(), active[None, :], 0), axis=1)
        return out, jnp.ones(self.T, dtype=jnp.bool_)

    def count(self, values, validity):
        return self._count_mask(self.live & validity)

    def count_star(self):
        return self._count_mask(self.live)

    def _extreme(self, values, validity, is_min):
        active = self.live & validity
        if jnp.issubdtype(values.dtype, jnp.floating):
            sent = jnp.asarray(jnp.inf if is_min else -jnp.inf, values.dtype)
        else:
            info = jnp.iinfo(values.dtype)
            sent = jnp.asarray(info.max if is_min else info.min, values.dtype)
        v = jnp.where(active, values, sent)
        v = jax.lax.optimization_barrier(v)
        red = jnp.min if is_min else jnp.max
        out = red(jnp.where(self._onehot(), v[None, :], sent), axis=1)
        cnt = self.count(values, validity)[0]
        return jnp.where(cnt > 0, out, jnp.zeros((), values.dtype)), cnt > 0

    def min(self, values, validity):
        return self._extreme(values, validity, True)

    def max(self, values, validity):
        return self._extreme(values, validity, False)

    def carry(self, values, validity):
        """Any value of the group (all equal by construction — the
        functional-dependency group-key demotion, optimizer.py)."""
        return self._extreme(values, validity, False)

    def percentile(self, values, validity, frac: float):
        cnt, gvalid = self.count(values, validity)
        ok = self.live & validity
        return _group_percentile(self.row_slot, ok, values, frac, cnt,
                                 gvalid, self.T)


def _group_percentile(gid, ok, values, frac: float, counts, gvalid, T: int):
    """Exact linear-interpolated percentile per group (percentile_cont).

    One (group, value) two-key sort packs each group's valid values into a
    contiguous ascending run at offset exclusive-cumsum(counts); the
    percentile is an interpolated two-gather read. No scatters; the only
    O(n log n) work is the sort (~30ms at 6M rows on v5e)."""
    n = values.shape[0]
    key = jnp.where(ok, gid.astype(jnp.int32), T)
    _, s_val = jax.lax.sort((key, values), num_keys=2, is_stable=False)
    cnt = counts.astype(jnp.int64)
    vstart = jnp.cumsum(cnt) - cnt          # exclusive prefix
    pos = vstart.astype(jnp.float64) + (cnt - 1).astype(jnp.float64) * frac
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int64), 0, n - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int64), 0, n - 1)
    w = pos - jnp.floor(pos)
    a = jnp.take(s_val, lo).astype(jnp.float64)
    b = jnp.take(s_val, hi).astype(jnp.float64)
    valid = gvalid & (cnt > 0)
    return jnp.where(valid, a * (1.0 - w) + b * w, 0.0), valid


class SortedLayout(NamedTuple):
    order: jax.Array         # (n,) permutation grouping equal keys
    run_id: jax.Array        # (n,) dense group id per SORTED position; dead -> G
    run_start: jax.Array     # (T,) sorted position of each run's first row
    run_end: jax.Array       # (T,) sorted position of each run's last row
    n_groups: jax.Array      # () int32
    live_sorted: jax.Array   # (n,) liveness in sorted order
    T: int                   # static max groups (output capacity)

    def _sorted_vals(self, values, validity):
        if self.order is None:
            # presorted layout (layout_from_sorted_keys): the whole batch
            # was moved by one variadic sort, so values arrive sorted —
            # no per-aggregate gather (jnp.take costs ~90ms/col at 6M rows
            # vs ~11ms/col riding the sort; ops/vsort.py)
            return values, validity & self.live_sorted
        v = jnp.take(values, self.order, mode="clip")
        ok = jnp.take(validity, self.order, mode="clip") & self.live_sorted
        return v, ok

    def _per_run(self, csum):
        """csum: inclusive cumsum over sorted contributions -> per-run sums.

        Runs are adjacent in sorted order (dead rows sentineled to the
        back with zero contribution), so csum[run_start_g - 1] ==
        csum[run_end_{g-1}]: ONE run-end gather + an adjacent difference
        replaces the old end+start gather pair (gathers at 2M cost ~30ms
        each on v5e)."""
        end = jnp.take(csum, jnp.clip(self.run_end, 0, csum.shape[0] - 1))
        prev = jnp.concatenate([jnp.zeros(1, end.dtype), end[:-1]])
        valid = jnp.arange(self.T, dtype=jnp.int32) < self.n_groups
        return jnp.where(valid, end - prev, jnp.zeros((), csum.dtype)), valid

    def sum(self, values, validity):
        v, ok = self._sorted_vals(values, validity)
        contrib = jnp.where(ok, v, jnp.zeros((), v.dtype))
        s, valid = self._per_run(jnp.cumsum(contrib))
        cnt, _ = self._per_run(jnp.cumsum(ok.astype(jnp.int64)))
        return s, valid & (cnt > 0)

    def count(self, values, validity):
        _, ok = self._sorted_vals(values, validity)
        c, valid = self._per_run(jnp.cumsum(ok.astype(jnp.int64)))
        return c, valid

    def count_star(self):
        c, valid = self._per_run(jnp.cumsum(self.live_sorted.astype(jnp.int64)))
        return c, valid

    def _extreme(self, values, validity, is_min):
        v, ok = self._sorted_vals(values, validity)
        # segmented prefix extremum by binary lifting (no scatter, no
        # associative_scan — both cost seconds/minutes on TPU); per-run
        # value read at run_end. Run starts derive from run_id changes.
        n = v.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        prev_id = jnp.concatenate([jnp.full(1, -1, self.run_id.dtype),
                                   self.run_id[:-1]])
        first = self.run_id != prev_id
        seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
        from ..exec.window import _segmented_prefix_extremum
        running, _ = _segmented_prefix_extremum(v, ok, seg_start,
                                                not is_min)
        out = jnp.take(running, jnp.clip(self.run_end, 0, n - 1))
        cnt, valid = self._per_run(jnp.cumsum(ok.astype(jnp.int64)))
        return (jnp.where(valid & (cnt > 0), out, jnp.zeros((), values.dtype)),
                valid & (cnt > 0))

    def min(self, values, validity):
        return self._extreme(values, validity, True)

    def max(self, values, validity):
        return self._extreme(values, validity, False)

    def carry(self, values, validity):
        """Any value of the group (all equal by construction — the FD
        group-key demotion): ONE T-sized gather at run ends instead of
        min's log(n) segmented-lifting passes over all n rows."""
        v, ok = self._sorted_vals(values, validity)
        n = v.shape[0]
        end = jnp.clip(self.run_end, 0, n - 1)
        out = jnp.take(v, end)
        okg = jnp.take(ok, end)
        gvalid = (jnp.arange(self.T, dtype=jnp.int32) < self.n_groups) & okg
        return jnp.where(gvalid, out, jnp.zeros((), values.dtype)), gvalid

    def percentile(self, values, validity, frac: float):
        v, ok = self._sorted_vals(values, validity)
        cnt, gvalid = self._per_run(jnp.cumsum(ok.astype(jnp.int64)))
        gid = jnp.minimum(self.run_id, self.T)
        return _group_percentile(gid, ok, v, frac, cnt, gvalid, self.T)


def fused_sorted_aggregate(s_keys: Sequence[jax.Array], live: jax.Array,
                           key_cols: Sequence[Column], reqs, T: int):
    """Segment aggregation over presorted keys with ONE shared compaction.

    SortedLayout reads each aggregate's per-run totals with T-sized
    `jnp.take`s out of n-sized running arrays (plus a `first_positions`
    sort for run_start) — at 2-4M groups each take costs ~60-90 ms on
    v5e and they dominated the r3 SF1 roofline table (q21's group-bys:
    225-760 ms/piece, <0.1% of HBM roofline). Here every aggregate
    contributes n-sized running arrays (cumsums / running extrema) whose
    value at each run's LAST live row is the run total, and ALL of them
    plus the key columns move front with one stable variadic sort
    (ops/vsort packing, ~11 ms/col marginal); per-run totals then come
    from adjacent differences in T-space.

    s_keys:   normalized sorted key limbs (dead rows sentineled back).
    live:     liveness in sorted order.
    key_cols: key columns evaluated on the sorted batch.
    reqs:     [(kind, data, validity)] with kind in {'count','sum','min',
              'max','carry'}; 'count' with data=None counts live rows.
    Returns (key_out, outs, n_groups, n_groups_total) with the exact
    output/validity semantics of the SortedLayout methods.
    """
    from ..batch import Batch
    from ..exec.window import _segmented_prefix_extremum
    from .vsort import sort_batch_columns

    n = live.shape[0]
    T = max(min(T, n), 1)
    pos = jnp.arange(n, dtype=jnp.int32)
    prev_same = jnp.ones(n, dtype=jnp.bool_)
    for k in s_keys:
        rolled = jnp.concatenate([k[:1], k[:-1]])
        prev_same = prev_same & (k == rolled)
    first = live & (~prev_same | (pos == 0))
    n_groups_total = jnp.cumsum(first.astype(jnp.int32))[-1]
    n_groups = jnp.minimum(n_groups_total, jnp.int32(T))
    next_first = jnp.concatenate([first[1:], jnp.ones(1, jnp.bool_)])
    next_live = jnp.concatenate([live[1:], jnp.zeros(1, jnp.bool_)])
    last = live & (next_first | ~next_live)

    seg_start = None
    cols: List[Column] = list(key_cols)
    plans = []
    for kind, data, validity in reqs:
        ok = live if validity is None else (validity & live)
        if kind == "count":
            cols.append(Column(jnp.cumsum(ok.astype(jnp.int64)), ok))
            plans.append((kind, len(cols) - 1))
        elif kind == "sum":
            contrib = jnp.where(ok, data, jnp.zeros((), data.dtype))
            cols.append(Column(jnp.cumsum(contrib), ok))
            cols.append(Column(jnp.cumsum(ok.astype(jnp.int64)), ok))
            plans.append((kind, len(cols) - 2))
        elif kind in ("min", "max"):
            if seg_start is None:
                seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
            run, _ = _segmented_prefix_extremum(data, ok, seg_start,
                                                kind == "max")
            cols.append(Column(run, ok))
            cols.append(Column(jnp.cumsum(ok.astype(jnp.int64)), ok))
            plans.append((kind, len(cols) - 2))
        elif kind == "carry":
            cols.append(Column(data, ok))
            plans.append((kind, len(cols) - 1))
        else:
            raise ValueError(f"unsupported fused aggregate kind {kind}")

    moved, _, _ = sort_batch_columns((~last,), Batch(tuple(cols), n_groups))
    gvalid = jnp.arange(T, dtype=jnp.int32) < n_groups

    def diff(arr):
        a = arr[:T]
        prev = jnp.concatenate([jnp.zeros(1, a.dtype), a[:-1]])
        return a - prev

    key_out = [Column(c.data[:T], c.validity[:T] & gvalid)
               for c in moved.columns[:len(key_cols)]]
    outs: List[Column] = []
    for kind, i in plans:
        if kind == "count":
            cnt = diff(moved.columns[i].data)
            outs.append(Column(jnp.where(gvalid, cnt, 0), gvalid))
        elif kind == "sum":
            s = diff(moved.columns[i].data)
            cnt = diff(moved.columns[i + 1].data)
            v = gvalid & (cnt > 0)
            outs.append(Column(jnp.where(v, s, jnp.zeros((), s.dtype)), v))
        elif kind in ("min", "max"):
            m = moved.columns[i].data[:T]
            cnt = diff(moved.columns[i + 1].data)
            v = gvalid & (cnt > 0)
            outs.append(Column(jnp.where(v, m, jnp.zeros((), m.dtype)), v))
        else:  # carry
            c = moved.columns[i]
            v = gvalid & c.validity[:T]
            outs.append(Column(jnp.where(v, c.data[:T],
                                         jnp.zeros((), c.data.dtype)), v))
    return key_out, outs, n_groups, n_groups_total


def direct_slots(key_cols: Sequence[Column], bounds: Sequence[int],
                 live: jax.Array,
                 nullables: Optional[Sequence[bool]] = None
                 ) -> Tuple[jax.Array, int]:
    """Composite group slot from statically-bounded key codes.

    A nullable key contributes (bound + 1) values (the +1 encodes NULL);
    a non-nullable key contributes exactly `bound` — TPC-H q1's
    (returnflag, linestatus) slot table shrinks 12 -> 6, halving the
    masked broadcast-reduce traffic. No hash table or claim loop:
    slot = sum(code_i * stride_i)."""
    if nullables is None:
        nullables = [True] * len(bounds)
    T = 1
    for b, nu in zip(bounds, nullables):
        T *= b + (1 if nu else 0)
    slot = jnp.zeros(key_cols[0].data.shape[0], dtype=jnp.int32)
    stride = 1
    for col, b, nu in zip(key_cols, bounds, nullables):
        code = jnp.clip(col.data.astype(jnp.int32), 0, b - 1)
        if nu:
            code = jnp.where(col.validity, code, b)
        slot = slot + code * jnp.int32(stride)
        stride *= b + (1 if nu else 0)
    return jnp.where(live, slot, T), T


def decode_direct_slot(slot_ids: jax.Array, key_cols: Sequence[Column],
                       bounds: Sequence[int],
                       nullables: Optional[Sequence[bool]] = None
                       ) -> List[Column]:
    """Reconstruct key columns from composite slot ids (arithmetic only)."""
    if nullables is None:
        nullables = [True] * len(bounds)
    out = []
    stride = 1
    for col, b, nu in zip(key_cols, bounds, nullables):
        width = b + (1 if nu else 0)
        code = (slot_ids // stride) % width
        valid = code < b if nu else jnp.ones_like(code, dtype=jnp.bool_)
        out.append(Column(code.astype(col.data.dtype), valid))
        stride *= width
    return out


def layout_from_sorted_keys(s_keys: Sequence[jax.Array],
                            live_sorted: jax.Array, T: int) -> SortedLayout:
    """SortedLayout over ALREADY-sorted keys (dead rows sentineled to the
    back): order=None means aggregate inputs arrive presorted — callers
    move the whole batch with one variadic sort (ops/vsort.py) instead of
    gathering per aggregate column."""
    n = s_keys[0].shape[0]
    T = min(T, n)
    return _run_layout(None, list(s_keys), live_sorted, n, T)


def _run_layout(order, s_keys, live_sorted, n: int, T: int) -> SortedLayout:
    pos = jnp.arange(n, dtype=jnp.int32)
    prev_same = jnp.ones(n, dtype=jnp.bool_)
    for k in s_keys:
        rolled = jnp.concatenate([k[:1], k[:-1]])
        prev_same = prev_same & (k == rolled)
    first = live_sorted & (~prev_same | (pos == 0))
    firsts_csum = jnp.cumsum(first.astype(jnp.int32))
    run_id = jnp.where(live_sorted, firsts_csum - 1, n)
    n_groups = firsts_csum[-1] if n else jnp.int32(0)
    gid = jnp.arange(T, dtype=jnp.int32)
    # run_start[g] = position of the g-th first — one stable bool-keyed
    # sort (ops/vsort.py; a T-query searchsorted costs seconds at 2M+)
    from .vsort import first_positions
    run_start = first_positions(first, T)
    run_start = jnp.clip(run_start, 0, n - 1)
    next_start = jnp.concatenate([run_start[1:], jnp.full(1, n, jnp.int32)])
    total_live = jnp.sum(live_sorted).astype(jnp.int32)
    run_end = jnp.where(gid + 1 < n_groups, next_start - 1, total_live - 1)
    run_end = jnp.clip(run_end, 0, n - 1)
    return SortedLayout(order, run_id, run_start, run_end, n_groups,
                        live_sorted, T)
