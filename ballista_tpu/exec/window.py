"""Window functions: sorted-space, scan-free, positional.

Reference parity: DataFusion's WindowAggExec family (BoundedWindowAggExec /
WindowAggExec). Notably the reference's DistributedPlanner REFUSES window
functions in distributed plans (`planner.rs:155` returns NotImplemented);
we support them locally AND distributed (shuffle on PARTITION BY keys —
see scheduler/distributed_planner.py), beating reference capability.

TPU design: one lexicographic argsort by (partition keys, order keys) per
distinct (PARTITION BY, ORDER BY) clause, then every function is a few
cummax/cumsum/gather passes over the sorted arrays (the same run-start
machinery as ops/merge_join.py — no scatters, no while_loops,
no associative_scan). Results route back through the inverse permutation,
so the operator is positional: rows in, same rows + window columns out.

Frames follow SQL defaults:
  - with ORDER BY:    RANGE UNBOUNDED PRECEDING .. CURRENT ROW (peers
                      share the frame end -> csum at peer-run end)
  - without ORDER BY: whole partition

Explicit frames: full ROWS BETWEEN support (UNBOUNDED/CURRENT/k
PRECEDING/FOLLOWING — sums via prefix-sum differences at the frame
bounds, extrema via a sparse-table range query: log n shifted-combine
levels + two overlapping power-of-two windows per position, scan- and
scatter-free). RANGE frames support UNBOUNDED/CURRENT bounds (value-offset
RANGE bounds are not implemented, matching DataFusion's common subset).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..batch import Batch, Column, row_mask
from ..exprs import Bound, Expr, _div_scaled, bind_expr, expr_name
from ..schema import Field, INT64, Schema, TypeKind
from ..ops.hash import _norm_keys
from ..ops.sort import SortKeySpec, _rankable
from .aggregate import _avg_dtype, _sum_dtype

def _segmented_prefix_extremum(vals: jax.Array, valid: jax.Array,
                               seg_start: jax.Array, is_max: bool):
    """Per position p: extremum of valid vals over [seg_start[p], p].

    Binary lifting: after pass k, m[p] covers a window of 2^(k+1) trailing
    positions clipped to p's segment — combining m[p] with m[p-2^k] is
    safe because p-2^k >= seg_start[p] implies both lie in one segment.
    O(log n) masked shift+combine passes; no scans, no scatters."""
    n = vals.shape[0]
    if jnp.issubdtype(vals.dtype, jnp.floating):
        sent = jnp.array(-jnp.inf if is_max else jnp.inf, vals.dtype)
    else:
        info = jnp.iinfo(vals.dtype)
        sent = jnp.array(info.min if is_max else info.max, vals.dtype)
    m = jnp.where(valid, vals, sent)
    av = valid
    pos = jnp.arange(n, dtype=jnp.int32)
    combine = jnp.maximum if is_max else jnp.minimum
    k = 1
    while k < n:
        shifted = jnp.concatenate([jnp.full(k, sent, vals.dtype), m[:-k]])
        sh_v = jnp.concatenate([jnp.zeros(k, jnp.bool_), av[:-k]])
        ok = (pos - k) >= seg_start
        m = combine(m, jnp.where(ok, shifted, sent))
        av = av | (ok & sh_v)
        k *= 2
    return m, av


RANKING = ("row_number", "rank", "dense_rank", "ntile", "percent_rank",
           "cume_dist")
AGGS = ("sum", "avg", "min", "max", "count", "count_star")
NAVIGATION = ("lag", "lead", "first_value", "last_value", "nth_value")


def _range_extremum(vals: jax.Array, valid: jax.Array, fs: jax.Array,
                    fe: jax.Array, is_max: bool):
    """Per position p: extremum of valid vals over [fs[p], fe[p]] (empty
    when fs>fe). Sparse table: level j covers [p, p+2^j-1]; a query range
    of length L is the combine of two (overlapping) level-floor(log2 L)
    windows anchored at fs and fe-2^j+1. O(n log n) build, 4 gathers per
    query, no scans/scatters."""
    n = vals.shape[0]
    if jnp.issubdtype(vals.dtype, jnp.floating):
        sent = jnp.array(-jnp.inf if is_max else jnp.inf, vals.dtype)
    else:
        info = jnp.iinfo(vals.dtype)
        sent = jnp.array(info.min if is_max else info.max, vals.dtype)
    combine = jnp.maximum if is_max else jnp.minimum
    m = jnp.where(valid, vals, sent)
    levels, vlevels = [m], [valid]
    k = 1
    while k < n:
        prev, pv = levels[-1], vlevels[-1]
        shifted = jnp.concatenate([prev[k:], jnp.full(k, sent, vals.dtype)])
        sv = jnp.concatenate([pv[k:], jnp.zeros(k, jnp.bool_)])
        levels.append(combine(prev, shifted))
        vlevels.append(pv | sv)
        k *= 2
    st = jnp.stack(levels)                     # (L, n)
    sv = jnp.stack(vlevels)
    length = fe - fs + 1
    j = jnp.where(length > 0,
                  jnp.floor(jnp.log2(jnp.maximum(length, 1)
                                     .astype(jnp.float64))).astype(jnp.int32),
                  0)
    pw = (jnp.int32(1) << j)
    ia = jnp.clip(fs, 0, n - 1)
    ib = jnp.clip(fe - pw + 1, 0, n - 1)
    flat_a = j * n + ia
    flat_b = j * n + ib
    va = jnp.take(st.reshape(-1), flat_a)
    vb = jnp.take(st.reshape(-1), flat_b)
    ok_a = jnp.take(sv.reshape(-1), flat_a)
    ok_b = jnp.take(sv.reshape(-1), flat_b)
    nonempty = length > 0
    out = combine(va, vb)
    return out, (ok_a | ok_b) & nonempty


@dataclasses.dataclass(frozen=True)
class WindowFnSpec:
    kind: str                       # RANKING | AGGS | NAVIGATION
    arg: Optional[Expr]             # None for row_number/rank/.../count(*)
    partition_by: Tuple[Expr, ...]
    order_by: Tuple[Tuple[Expr, bool, Optional[bool]], ...]
    offset: int = 1                 # lag/lead distance; ntile N; nth_value k
    frame: Optional[Tuple[str, Optional[int], Optional[int]]] = None
    alias: Optional[str] = None

    @property
    def name(self) -> str:
        if self.alias:
            return self.alias
        a = expr_name(self.arg) if self.arg is not None else ""
        return f"{self.kind}({a})"


def _out_field(spec: WindowFnSpec, in_schema: Schema) -> Field:
    k = spec.kind
    if k in ("row_number", "rank", "dense_rank", "ntile"):
        return Field(spec.name, INT64, nullable=False)
    if k in ("count", "count_star"):
        return Field(spec.name, INT64, nullable=False)
    if k in ("percent_rank", "cume_dist"):
        from ..schema import FLOAT64
        return Field(spec.name, FLOAT64, nullable=False)
    b = bind_expr(spec.arg, in_schema)
    if k == "sum":
        return Field(spec.name, _sum_dtype(b.dtype), nullable=True)
    if k == "avg":
        return Field(spec.name, _avg_dtype(b.dtype), nullable=True)
    if k in ("min", "max", "lag", "lead", "first_value", "last_value",
             "nth_value"):
        return Field(spec.name, b.dtype, nullable=True)
    raise NotImplementedError(f"window function {k}")


from .plan import ExecNode


class WindowExec(ExecNode):
    """Positional operator: child rows + one new column per window spec.

    Specs sharing (partition_by, order_by) reuse one sort. min/max without
    ORDER BY use a second value-keyed sort per spec (partition extremum =
    run head of that sort)."""

    def __init__(self, child, specs: Sequence[WindowFnSpec]):
        self.children = (child,)
        self.specs = tuple(specs)
        self.capacity = child.capacity
        in_schema = child.schema
        new_fields = []
        for s in self.specs:
            if s.kind in ("rank", "dense_rank", "row_number", "lag", "lead",
                          "first_value", "last_value", "ntile",
                          "percent_rank", "cume_dist", "nth_value") \
                    and not s.order_by:
                raise ValueError(f"{s.kind} requires OVER(... ORDER BY ...)")
            if s.frame is not None:
                mode, lo, hi = s.frame
                if mode == "range" and ((lo not in (None, 0))
                                        or (hi not in (None, 0))):
                    raise NotImplementedError(
                        "RANGE frames with value offsets; use ROWS")
            new_fields.append(_out_field(s, in_schema))
        names = [f.name for f in in_schema.fields] + [f.name for f in new_fields]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate column names in window output: {names}")
        self.schema = Schema(in_schema.fields + tuple(new_fields),
                             dict(in_schema.dictionaries),
                             in_schema.int_bounds, in_schema.unsorted)
        # group specs by shared clause
        self._groups: Dict[Tuple, List[int]] = {}
        for i, s in enumerate(self.specs):
            key = (tuple(str(e) for e in s.partition_by),
                   tuple((str(e), asc, nf) for e, asc, nf in s.order_by))
            self._groups.setdefault(key, []).append(i)
        # RAW string partition/order keys re-encode on demand
        # (exprs.sorted_recode): dense-rank codes restore value equality
        # (partitioning) and lexicographic order (ordering)
        from ..exprs import sorted_recode
        self._bound_parts = [tuple(sorted_recode(bind_expr(e, in_schema))
                                   for e in s.partition_by)
                             for s in self.specs]
        self._bound_orders = [tuple((sorted_recode(bind_expr(e, in_schema)),
                                     asc, nf)
                                    for e, asc, nf in s.order_by)
                              for s in self.specs]
        self._bound_args = [bind_expr(s.arg, in_schema) if s.arg is not None
                            else None for s in self.specs]

    def _label(self):
        return f"WindowExec({[s.name for s in self.specs]})"

    # -- evaluation --

    def evaluate(self, inputs) -> Batch:
        b = self.children[0].evaluate(inputs)
        live = row_mask(b)
        n = b.capacity
        out_cols: List[Column] = [None] * len(self.specs)

        for key, idxs in self._groups.items():
            rep = idxs[0]
            parts = self._bound_parts[rep]
            orders = self._bound_orders[rep]
            perm, inv, seg_start, seg_end, peer_start, peer_end, peer_first, \
                part_first = self._sorted_layout(b, live, parts, orders)
            for i in idxs:
                out_cols[i] = self._compute(b, live, n, i, perm, inv,
                                            seg_start, seg_end, peer_start,
                                            peer_end, peer_first, part_first,
                                            bool(orders))
        live_cols = [Column(c.data, c.validity & live) for c in out_cols]
        return Batch(b.columns + tuple(live_cols), b.num_rows)

    def _sorted_layout(self, b: Batch, live, parts: Tuple[Bound, ...],
                       orders):
        """Sort by (liveness, partition keys, order keys); return run info."""
        n = b.capacity
        pcols = [p.fn(b) for p in parts]
        pnorm = _norm_keys(tuple(c.data for c in pcols),
                           tuple(c.validity for c in pcols))
        oranks = []
        for ob, asc, nf in orders:
            c = ob.fn(b)
            oranks.append(_rankable(c.data, c.validity,
                                    SortKeySpec(0, asc, nf)))
        # ONE variadic sort replaces the iterated argsort+take chain
        # (2 ops per key at ~90ms/6M-row gather); the sorted keys come out
        # as byproducts so run detection needs no re-gathers, and the
        # inverse permutation is one single-operand sort
        keys = [~live] + list(pnorm) + list(oranks)
        cidx = jnp.arange(n, dtype=jnp.int32)
        out = jax.lax.sort(tuple(keys) + (cidx,), num_keys=len(keys),
                           is_stable=True)
        perm = out[-1]
        pos = jnp.arange(n, dtype=jnp.int32)
        limb = (perm.astype(jnp.int64) << 32) | pos.astype(jnp.int64)
        (sl,) = jax.lax.sort((limb,), num_keys=1, is_stable=False)
        inv = (sl & 0xFFFFFFFF).astype(jnp.int32)

        s_live = ~out[0]
        part_same = jnp.ones(n, dtype=jnp.bool_)
        for sk in out[1:1 + len(pnorm)]:
            part_same = part_same & (sk == jnp.concatenate([sk[:1], sk[:-1]]))
        lv_same = s_live == jnp.concatenate([s_live[:1], s_live[:-1]])
        part_first = ~part_same | ~lv_same | (pos == 0)
        peer_same = part_same & lv_same
        for sk in out[1 + len(pnorm):1 + len(pnorm) + len(oranks)]:
            peer_same = peer_same & (sk == jnp.concatenate([sk[:1], sk[:-1]]))
        peer_first = ~peer_same | (pos == 0)

        seg_start = jax.lax.cummax(jnp.where(part_first, pos, 0))
        peer_start = jax.lax.cummax(jnp.where(peer_first, pos, 0))
        # run ends via reverse cummin over last-flags
        part_last = jnp.concatenate([part_first[1:], jnp.ones(1, jnp.bool_)])
        peer_last = jnp.concatenate([peer_first[1:], jnp.ones(1, jnp.bool_)])
        seg_end = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(part_last, pos, n - 1))))
        peer_end = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(peer_last, pos, n - 1))))
        return perm, inv, seg_start, seg_end, peer_start, peer_end, \
            peer_first, part_first

    @staticmethod
    def _frame_bounds(spec, pos, seg_start, seg_end, peer_start, peer_end,
                      has_order):
        """Per sorted position: the frame [fs, fe] (fs > fe = empty)."""
        if spec.frame is None:
            if has_order:
                return seg_start, peer_end   # RANGE UNBOUNDED..CURRENT
            return seg_start, seg_end
        mode, lo, hi = spec.frame
        if mode == "range":
            fs = seg_start if lo is None else peer_start
            fe = seg_end if hi is None else peer_end
        else:  # rows
            fs = seg_start if lo is None else jnp.clip(pos + lo, seg_start,
                                                       seg_end + 1)
            fe = seg_end if hi is None else jnp.clip(pos + hi, seg_start - 1,
                                                     seg_end)
        return fs, fe

    def _compute(self, b, live, n, i, perm, inv, seg_start, seg_end,
                 peer_start, peer_end, peer_first, part_first,
                 has_order) -> Column:
        spec = self.specs[i]
        k = spec.kind
        pos = jnp.arange(n, dtype=jnp.int32)
        seg_size = seg_end - seg_start + 1

        if k == "row_number":
            v = (pos - seg_start + 1).astype(jnp.int64)
            return Column(jnp.take(v, inv), jnp.ones(n, jnp.bool_))
        if k == "rank":
            v = (peer_start - seg_start + 1).astype(jnp.int64)
            return Column(jnp.take(v, inv), jnp.ones(n, jnp.bool_))
        if k == "dense_rank":
            pf = jnp.cumsum(peer_first.astype(jnp.int64))
            v = pf - jnp.take(pf, seg_start) + 1
            return Column(jnp.take(v, inv), jnp.ones(n, jnp.bool_))
        if k == "ntile":
            # SQL ntile(N): first (size mod N) buckets get one extra row
            N = spec.offset
            r = pos - seg_start
            base = seg_size // N
            rem = seg_size % N
            cut = rem * (base + 1)
            lo_b = r // jnp.maximum(base + 1, 1)
            hi_b = rem + (r - cut) // jnp.maximum(base, 1)
            v = (jnp.where(r < cut, lo_b, hi_b) + 1).astype(jnp.int64)
            return Column(jnp.take(v, inv), jnp.ones(n, jnp.bool_))
        if k == "percent_rank":
            rank0 = (peer_start - seg_start).astype(jnp.float64)
            v = jnp.where(seg_size > 1,
                          rank0 / jnp.maximum(seg_size - 1, 1)
                          .astype(jnp.float64), 0.0)
            return Column(jnp.take(v, inv), jnp.ones(n, jnp.bool_))
        if k == "cume_dist":
            v = ((peer_end - seg_start + 1).astype(jnp.float64)
                 / seg_size.astype(jnp.float64))
            return Column(jnp.take(v, inv), jnp.ones(n, jnp.bool_))

        fs, fe = self._frame_bounds(spec, pos, seg_start, seg_end,
                                    peer_start, peer_end, has_order)

        if k in ("min", "max"):
            if not has_order and spec.frame is None:
                return self._partition_extremum(b, live, n, i, spec)
            arg = self._bound_args[i]
            c = arg.fn(b)
            sdata = jnp.take(c.data, perm)
            svalid = jnp.take(c.validity & live, perm)
            if spec.frame is None or spec.frame[1] is None:
                # frame start is the partition start (constant over the
                # span [p, fe]): segmented prefix extremum by binary
                # lifting, read at the frame end
                pm, pv = _segmented_prefix_extremum(sdata, svalid, fs,
                                                    k == "max")
                end = jnp.clip(fe, 0, n - 1)
                ok = jnp.take(pv, end) & (fs <= fe)
                return Column(jnp.take(jnp.take(pm, end), inv),
                              jnp.take(ok, inv))
            pm, pv = _range_extremum(sdata, svalid, fs, fe, k == "max")
            return Column(jnp.take(pm, inv), jnp.take(pv, inv))

        arg = self._bound_args[i]
        if arg is not None:
            c = arg.fn(b)
            sdata = jnp.take(c.data, perm)
            svalid = jnp.take(c.validity & live, perm)
        else:
            sdata = jnp.zeros(n, jnp.int64)
            svalid = jnp.take(live, perm)

        if k in ("lag", "lead"):
            off = spec.offset if k == "lag" else -spec.offset
            src = pos - off
            in_part = (src >= seg_start) & (src <= seg_end)
            srcc = jnp.clip(src, 0, n - 1)
            v = jnp.take(sdata, srcc)
            val = jnp.take(svalid, srcc) & in_part
            return Column(jnp.take(v, inv), jnp.take(val, inv))
        if k in ("first_value", "last_value", "nth_value"):
            nonempty = fs <= fe
            if k == "first_value":
                idx = fs
            elif k == "last_value":
                idx = fe
            else:
                idx = fs + (spec.offset - 1)
                nonempty = nonempty & (idx <= fe)
            idx = jnp.clip(idx, 0, n - 1)
            v = jnp.take(sdata, idx)
            val = jnp.take(svalid, idx) & nonempty
            return Column(jnp.take(v, inv), jnp.take(val, inv))

        # framed / cumulative / whole-partition sum, count, avg: prefix-sum
        # differences at the frame bounds (csum0[i] = sum over [0, i))
        out_dt = self.schema.fields[len(b.columns) + i].dtype
        if k in ("sum", "avg") and out_dt.kind in (TypeKind.DECIMAL,
                                                   TypeKind.INT64):
            acc = jnp.where(svalid, sdata.astype(jnp.int64), 0)
        elif k in ("count", "count_star"):
            acc = svalid.astype(jnp.int64)
        else:
            acc = jnp.where(svalid, sdata, jnp.zeros_like(sdata))
        csum0 = jnp.concatenate([jnp.zeros(1, acc.dtype), jnp.cumsum(acc)])
        ccnt0 = jnp.concatenate([jnp.zeros(1, jnp.int64),
                                 jnp.cumsum(svalid.astype(jnp.int64))])
        nonempty = fs <= fe
        hi_i = jnp.clip(fe + 1, 0, n)
        lo_i = jnp.clip(fs, 0, n)
        total = jnp.take(csum0, hi_i) - jnp.take(csum0, lo_i)
        count = jnp.take(ccnt0, hi_i) - jnp.take(ccnt0, lo_i)
        total = jnp.where(nonempty, total, jnp.zeros_like(total))
        count = jnp.where(nonempty, count, 0)

        if k in ("count", "count_star"):
            return Column(jnp.take(count, inv), jnp.ones(n, jnp.bool_))
        if k == "sum":
            return Column(jnp.take(total, inv).astype(out_dt.jnp_dtype),
                          jnp.take(count > 0, inv))
        # avg
        if out_dt.kind is TypeKind.DECIMAL:
            in_scale = _sum_dtype(self._bound_args[i].dtype).scale
            q = _div_scaled(total, jnp.maximum(count, 1),
                            out_dt.scale - in_scale)
            return Column(jnp.take(q, inv), jnp.take(count > 0, inv))
        d = total.astype(out_dt.jnp_dtype) / jnp.maximum(count, 1).astype(
            out_dt.jnp_dtype)
        return Column(jnp.take(d, inv), jnp.take(count > 0, inv))

    def _partition_extremum(self, b, live, n, i, spec) -> Column:
        """min/max over the whole partition: second sort keyed by
        (partition keys, value) — the extremum is each run's head value."""
        parts = self._bound_parts[i]
        arg = self._bound_args[i]
        c = arg.fn(b)
        pcols = [p.fn(b) for p in parts]
        pnorm = _norm_keys(tuple(x.data for x in pcols),
                           tuple(x.validity for x in pcols))
        vrank = _rankable(c.data, c.validity & live,
                          SortKeySpec(0, spec.kind == "min", False))
        # one variadic sort; the value/validity ride as payloads so the
        # per-column re-gathers disappear (see _sorted_layout)
        cidx = jnp.arange(n, dtype=jnp.int32)
        keys = [~live] + list(pnorm) + [vrank]
        out = jax.lax.sort(
            tuple(keys) + (cidx, c.data,
                           (c.validity & live).astype(jnp.int32)),
            num_keys=len(keys), is_stable=True)
        perm, sdata, svalid = out[-3], out[-2], out[-1].astype(jnp.bool_)

        pos = jnp.arange(n, dtype=jnp.int32)
        s_live = ~out[0]
        part_same = jnp.ones(n, dtype=jnp.bool_)
        for sk in out[1:1 + len(pnorm)]:
            part_same = part_same & (sk == jnp.concatenate([sk[:1], sk[:-1]]))
        lv_same = s_live == jnp.concatenate([s_live[:1], s_live[:-1]])
        part_first = ~part_same | ~lv_same | (pos == 0)
        seg_start = jax.lax.cummax(jnp.where(part_first, pos, 0))

        v = jnp.take(sdata, seg_start)
        val = jnp.take(svalid, seg_start)  # nulls sort last: head valid iff any
        # route back to original row order: values ride a single-key sort
        back = jax.lax.sort((perm, v, val.astype(jnp.int32)), num_keys=1,
                            is_stable=False)
        return Column(back[1], back[2].astype(jnp.bool_))
