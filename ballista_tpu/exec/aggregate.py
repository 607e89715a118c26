"""Aggregate expression machinery (two-phase, DataFusion Partial/Final parity).

Each AggExpr binds to: partial state columns (computed per partition),
a merge step (re-aggregate states after shuffle on group keys), and a
finalize projection (e.g. avg = sum / count in exact decimal math).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp

from ..batch import Batch, Column
from ..exprs import Bound, Expr, _div_scaled, bind_expr, expr_name
from ..schema import DataType, Field, FLOAT32, FLOAT64, INT64, Schema, TypeKind, decimal


@dataclasses.dataclass(frozen=True)
class AggExpr:
    kind: str                 # sum | count | count_star | min | max | avg |
                              # var_samp | var_pop | stddev_samp | stddev_pop |
                              # corr | median | percentile
    arg: Optional[Expr] = None
    alias: Optional[str] = None
    distinct: bool = False
    arg2: Optional[Expr] = None     # corr's second argument
    frac: Optional[float] = None    # percentile fraction (median = 0.5)

    @property
    def name(self) -> str:
        if self.alias:
            return self.alias
        if self.kind == "count_star":
            return "count(*)"
        if self.kind == "corr":
            return f"corr({expr_name(self.arg)}, {expr_name(self.arg2)})"
        return f"{self.kind}({expr_name(self.arg)})"


# kinds whose state cannot be merged across partitions: the distributed
# planner shuffles raw rows on the group key and aggregates once instead
# of the partial/final split (DataFusion treats Median the same way)
NON_DECOMPOSABLE = ("median", "percentile")
MOMENT_KINDS = ("var_samp", "var_pop", "stddev_samp", "stddev_pop")


def _sum_dtype(dt: DataType) -> DataType:
    if dt.kind is TypeKind.DECIMAL:
        return decimal(18, dt.scale)
    if dt.is_integer:
        return INT64
    return dt


def _avg_dtype(dt: DataType) -> DataType:
    if dt.kind is TypeKind.DECIMAL:
        return decimal(18, min(dt.scale + 4, 12))
    return FLOAT64 if dt.kind is TypeKind.FLOAT64 else FLOAT32 if dt.kind is TypeKind.FLOAT32 else FLOAT64


class BoundAgg:
    """One aggregate bound against the input schema."""

    def __init__(self, spec: AggExpr, in_schema: Schema):
        self.spec = spec
        self.arg: Optional[Bound] = (
            bind_expr(spec.arg, in_schema) if spec.arg is not None else None)
        k = spec.kind
        if k == "count_star" or k == "count":
            self.state_dtypes = [INT64]
            self.out_field = Field(spec.name, INT64, nullable=False)
        elif k == "sum":
            st = _sum_dtype(self.arg.dtype)
            self.state_dtypes = [st]
            self.out_field = Field(spec.name, st, nullable=True)
        elif k in ("min", "max", "carry"):
            # carry: any value of the group — all equal by construction
            # (FD group-key demotion, planner/optimizer.py); O(T) gather
            # instead of a segmented extremum over all rows
            self.state_dtypes = [self.arg.dtype]
            self.out_field = Field(spec.name, self.arg.dtype, nullable=True)
        elif k == "avg":
            st = _sum_dtype(self.arg.dtype)
            self.state_dtypes = [st, INT64]
            self.out_field = Field(spec.name, _avg_dtype(self.arg.dtype), nullable=True)
        elif k in MOMENT_KINDS:
            # one-pass moments: [sum(x), sum(x^2), n] in f64
            self.state_dtypes = [FLOAT64, FLOAT64, INT64]
            self.out_field = Field(spec.name, FLOAT64, nullable=True)
        elif k == "corr":
            self.arg2 = bind_expr(spec.arg2, in_schema)
            self.state_dtypes = [FLOAT64, FLOAT64, FLOAT64, FLOAT64,
                                 FLOAT64, INT64]
            self.out_field = Field(spec.name, FLOAT64, nullable=True)
        elif k in NON_DECOMPOSABLE:
            self.state_dtypes = [FLOAT64]
            self.out_field = Field(spec.name, FLOAT64, nullable=True)
        else:
            raise NotImplementedError(f"aggregate {k}")

    def state_fields(self) -> List[Field]:
        return [Field(f"{self.spec.name}#s{i}", dt, True)
                for i, dt in enumerate(self.state_dtypes)]

    # --- fused one-compaction sorted path (ops/segagg.fused_sorted_aggregate) ---
    # Each method returns (reqs, assemble) where reqs is a list of
    # (kind, data, validity) requests and assemble maps the per-request
    # output Columns to this aggregate's state columns — or None when the
    # kind can't ride the shared compaction (percentile needs its own
    # value sort). State values/validities mirror partial()/merge()
    # exactly; the exec falls back to the SortedLayout path when any
    # aggregate in the group returns None.
    def fused_requests(self, batch: Batch):
        k = self.spec.kind
        if k in NON_DECOMPOSABLE:
            return None
        if k == "count_star":
            return [("count", None, None)], lambda outs: list(outs)
        col = self.arg.fn(batch)
        data = col.data
        if k in ("sum", "avg") and self.state_dtypes[0].kind in (
                TypeKind.DECIMAL, TypeKind.INT64):
            data = data.astype(jnp.int64)
        if k == "count":
            return [("count", data, col.validity)], lambda outs: list(outs)
        if k in ("sum", "min", "max", "carry"):
            return [(k, data, col.validity)], lambda outs: list(outs)
        ones = lambda c: Column(c.data, jnp.ones_like(c.validity))  # noqa: E731
        if k == "avg":
            return ([("sum", data, col.validity),
                     ("count", data, col.validity)],
                    lambda outs: [outs[0], ones(outs[1])])
        if k in MOMENT_KINDS:
            x = _as_f64(self.arg, col)
            return ([("sum", x, col.validity),
                     ("sum", x * x, col.validity),
                     ("count", x, col.validity)],
                    lambda outs: [ones(o) for o in outs])
        if k == "corr":
            col2 = self.arg2.fn(batch)
            both = col.validity & col2.validity
            x = _as_f64(self.arg, col)
            y = _as_f64(self.arg2, col2)
            return ([("sum", x, both), ("sum", y, both),
                     ("sum", x * x, both), ("sum", y * y, both),
                     ("sum", x * y, both), ("count", x, both)],
                    lambda outs: [ones(o) for o in outs])
        return None

    def fused_merge_requests(self, state_cols: List[Column]):
        k = self.spec.kind
        if k in NON_DECOMPOSABLE:
            return None
        ones = lambda c: Column(c.data, jnp.ones_like(c.validity))  # noqa: E731
        if k in ("count", "count_star"):
            return ([("sum", state_cols[0].data, state_cols[0].validity)],
                    lambda outs: [ones(outs[0])])
        if k in ("sum", "min", "max", "carry"):
            return ([(k, state_cols[0].data, state_cols[0].validity)],
                    lambda outs: list(outs))
        if k == "avg":
            return ([("sum", state_cols[0].data, state_cols[0].validity),
                     ("sum", state_cols[1].data, state_cols[1].validity)],
                    lambda outs: [outs[0], ones(outs[1])])
        if k in MOMENT_KINDS or k == "corr":
            return ([("sum", sc.data, sc.validity) for sc in state_cols],
                    lambda outs: [ones(o) for o in outs])
        return None

    # --- phase 1: raw rows -> per-group states (layout: ops.segagg) ---
    def partial(self, batch: Batch, layout) -> List[Column]:
        k = self.spec.kind
        if k == "count_star":
            cnt, v = layout.count_star()
            return [Column(cnt, v)]
        col = self.arg.fn(batch)
        data = col.data
        if self.spec.kind in ("sum", "avg") and self.state_dtypes[0].kind in (TypeKind.DECIMAL, TypeKind.INT64):
            data = data.astype(jnp.int64)
        if k == "count":
            cnt, v = layout.count(data, col.validity)
            return [Column(cnt, v)]
        if k == "sum":
            s, v = layout.sum(data, col.validity)
            return [Column(s, v)]
        if k == "min":
            m, v = layout.min(data, col.validity)
            return [Column(m, v)]
        if k == "max":
            m, v = layout.max(data, col.validity)
            return [Column(m, v)]
        if k == "carry":
            m, v = layout.carry(data, col.validity)
            return [Column(m, v)]
        if k == "avg":
            s, sv = layout.sum(data, col.validity)
            c, _ = layout.count(data, col.validity)
            return [Column(s, sv), Column(c, jnp.ones_like(sv))]
        if k in MOMENT_KINDS:
            x = _as_f64(self.arg, col)
            s1, v = layout.sum(x, col.validity)
            s2, _ = layout.sum(x * x, col.validity)
            n, _ = layout.count(x, col.validity)
            ones = jnp.ones_like(v)
            return [Column(s1, ones), Column(s2, ones),
                    Column(n, ones)]
        if k == "corr":
            col2 = self.arg2.fn(batch)
            both = col.validity & col2.validity
            x = _as_f64(self.arg, col)
            y = _as_f64(self.arg2, col2)
            sx, v = layout.sum(x, both)
            sy, _ = layout.sum(y, both)
            sxx, _ = layout.sum(x * x, both)
            syy, _ = layout.sum(y * y, both)
            sxy, _ = layout.sum(x * y, both)
            n, _ = layout.count(x, both)
            ones = jnp.ones_like(v)
            return [Column(sx, ones), Column(sy, ones), Column(sxx, ones),
                    Column(syy, ones), Column(sxy, ones), Column(n, ones)]
        if k in NON_DECOMPOSABLE:
            frac = 0.5 if k == "median" else float(self.spec.frac)
            x = _as_f64(self.arg, col)
            p, v = layout.percentile(x, col.validity, frac)
            return [Column(p, v)]
        raise NotImplementedError(k)

    # --- phase 2: partial states -> merged states (after shuffle) ---
    def merge(self, state_cols: List[Column], layout) -> List[Column]:
        k = self.spec.kind
        if k in ("count", "count_star"):
            s, v = layout.sum(state_cols[0].data, state_cols[0].validity)
            return [Column(s, jnp.ones_like(s, dtype=jnp.bool_))]
        if k == "sum":
            s, v = layout.sum(state_cols[0].data, state_cols[0].validity)
            return [Column(s, v)]
        if k == "min":
            m, v = layout.min(state_cols[0].data, state_cols[0].validity)
            return [Column(m, v)]
        if k == "max":
            m, v = layout.max(state_cols[0].data, state_cols[0].validity)
            return [Column(m, v)]
        if k == "carry":
            m, v = layout.carry(state_cols[0].data, state_cols[0].validity)
            return [Column(m, v)]
        if k == "avg":
            s, sv = layout.sum(state_cols[0].data, state_cols[0].validity)
            c, _ = layout.sum(state_cols[1].data, state_cols[1].validity)
            return [Column(s, sv), Column(c, jnp.ones_like(sv, dtype=jnp.bool_))]
        if k in MOMENT_KINDS or k == "corr":
            out = []
            for sc in state_cols:
                s, v = layout.sum(sc.data, sc.validity)
                out.append(Column(s, jnp.ones_like(v)))
            return out
        if k in NON_DECOMPOSABLE:
            raise NotImplementedError(
                f"{k} state cannot be merged; the planner must shuffle raw "
                "rows (NON_DECOMPOSABLE fallback)")
        raise NotImplementedError(k)

    # --- finalize: merged states -> output column ---
    def finalize(self, state_cols: List[Column]) -> Column:
        k = self.spec.kind
        if k in ("count", "count_star", "sum", "min", "max", "carry"):
            return state_cols[0]
        if k == "avg":
            s, c = state_cols
            out = self.out_field.dtype
            if out.kind is TypeKind.DECIMAL:
                in_scale = self.state_dtypes[0].scale
                q = _div_scaled(s.data, jnp.maximum(c.data, 1),
                                out.scale - in_scale)
                return Column(q, s.validity & (c.data > 0))
            d = s.data.astype(out.jnp_dtype) / jnp.maximum(c.data, 1).astype(out.jnp_dtype)
            return Column(d, s.validity & (c.data > 0))
        if k in MOMENT_KINDS:
            s1, s2, nn = (c.data for c in state_cols)
            n = jnp.maximum(nn, 1).astype(jnp.float64)
            pop = s2 / n - (s1 / n) ** 2
            if k.endswith("_pop"):
                var = pop
                valid = nn > 0
            else:
                var = jnp.where(nn > 1, (s2 - s1 * s1 / n)
                                / jnp.maximum(n - 1.0, 1.0), 0.0)
                valid = nn > 1
            var = jnp.maximum(var, 0.0)     # clamp f64 cancellation noise
            out = jnp.sqrt(var) if k.startswith("stddev") else var
            return Column(jnp.where(valid, out, 0.0), valid)
        if k == "corr":
            sx, sy, sxx, syy, sxy, nn = (c.data for c in state_cols)
            n = nn.astype(jnp.float64)
            cov = n * sxy - sx * sy
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            denom = jnp.sqrt(jnp.maximum(dx, 0.0) * jnp.maximum(dy, 0.0))
            valid = (nn > 1) & (denom > 0)
            return Column(jnp.where(valid, cov / jnp.maximum(denom, 1e-300),
                                    0.0), valid)
        if k in NON_DECOMPOSABLE:
            return state_cols[0]
        raise NotImplementedError(k)


def _as_f64(bound: Bound, col: Column):
    d = col.data
    if bound.dtype.kind is TypeKind.DECIMAL:
        return d.astype(jnp.float64) / (10.0 ** bound.dtype.scale)
    return d.astype(jnp.float64)
