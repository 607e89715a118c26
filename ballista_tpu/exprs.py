"""Scalar expression AST + binder + device evaluators.

Reference parity: DataFusion's `PhysicalExpr` tree evaluated per RecordBatch
(the engine kernel under Ballista, SURVEY.md §1 "Engine kernel" row). Here an
expression is bound against a Schema at plan time, producing a closure
`(Batch) -> Column` that traces into the stage's single XLA program.

Key TPU-first choices:
- Three-valued (Kleene) NULL logic carried as validity masks, fused by XLA
  into the surrounding elementwise graph.
- DECIMAL arithmetic on scaled int64 (exact, like Arrow decimal128).
- String predicates (=, IN, LIKE, <) are evaluated against the column's
  *sorted host-side dictionary* at bind time, becoming O(1) device lookups
  (code compare or boolean LUT gather) instead of byte comparisons.
"""

from __future__ import annotations

import dataclasses
import datetime
import re
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .schema import (BOOL, DATE32, DataType, Field, FLOAT32, FLOAT64, INT32,
                     INT64, Schema, STRING, TypeKind, decimal)
from .batch import Batch, Column

# ---------------------------------------------------------------------------
# AST nodes (logical expressions — used by the SQL frontend & DataFrame API)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Expr:
    def __str__(self):
        return expr_name(self)

    # -- DataFrame-API operator sugar (DataFusion python-binding style).
    # NOTE: __eq__ stays structural (dataclass) so exprs work in dicts/sets;
    # use .eq()/.neq() to build equality predicates.
    def _bin(self, op, other, swap=False):
        other = other if isinstance(other, Expr) else Lit(other)
        return BinOp(op, other, self) if swap else BinOp(op, self, other)

    def __gt__(self, o):
        return self._bin(">", o)

    def __ge__(self, o):
        return self._bin(">=", o)

    def __lt__(self, o):
        return self._bin("<", o)

    def __le__(self, o):
        return self._bin("<=", o)

    def __add__(self, o):
        return self._bin("+", o)

    def __radd__(self, o):
        return self._bin("+", o, swap=True)

    def __sub__(self, o):
        return self._bin("-", o)

    def __rsub__(self, o):
        return self._bin("-", o, swap=True)

    def __mul__(self, o):
        return self._bin("*", o)

    def __rmul__(self, o):
        return self._bin("*", o, swap=True)

    def __truediv__(self, o):
        return self._bin("/", o)

    def __rtruediv__(self, o):
        return self._bin("/", o, swap=True)

    def __and__(self, o):
        return self._bin("and", o)

    def __or__(self, o):
        return self._bin("or", o)

    def __invert__(self):
        return Not(self)

    def __neg__(self):
        return Neg(self)

    def eq(self, o):
        return self._bin("=", o)

    def neq(self, o):
        return self._bin("!=", o)

    def is_null(self):
        return IsNull(self)

    def is_not_null(self):
        return IsNull(self, negated=True)

    def alias(self, name):
        return Alias(self, name)


@dataclasses.dataclass(frozen=True)
class Col(Expr):
    name: str


@dataclasses.dataclass(frozen=True)
class Lit(Expr):
    value: Any
    dtype: Optional[DataType] = None  # inferred if None


@dataclasses.dataclass(frozen=True)
class IntervalLit(Expr):
    """SQL INTERVAL literal; only exists pre-folding (date +/- interval)."""
    months: int = 0
    days: int = 0


@dataclasses.dataclass(frozen=True)
class BinOp(Expr):
    op: str  # + - * / and or = != < <= > >=
    left: Expr
    right: Expr


@dataclasses.dataclass(frozen=True)
class Not(Expr):
    child: Expr


@dataclasses.dataclass(frozen=True)
class Neg(Expr):
    child: Expr


@dataclasses.dataclass(frozen=True)
class IsNull(Expr):
    child: Expr
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class Cast(Expr):
    child: Expr
    dtype: DataType


@dataclasses.dataclass(frozen=True)
class Case(Expr):
    # CASE WHEN c1 THEN v1 ... ELSE e END  (searched form)
    whens: Tuple[Tuple[Expr, Expr], ...]
    otherwise: Optional[Expr] = None


@dataclasses.dataclass(frozen=True)
class InList(Expr):
    child: Expr
    values: Tuple[Expr, ...]
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class Like(Expr):
    child: Expr
    pattern: str
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class Between(Expr):
    child: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class Alias(Expr):
    child: Expr
    name: str


@dataclasses.dataclass(frozen=True)
class ScalarFn(Expr):
    name: str  # extract_year, abs, coalesce, ...
    args: Tuple[Expr, ...]


def expr_name(e: Expr) -> str:
    """Display/output name of an expression (column header)."""
    if isinstance(e, Alias):
        return e.name
    if isinstance(e, Col):
        return e.name
    if isinstance(e, Lit):
        return str(e.value)
    if isinstance(e, BinOp):
        return f"{expr_name(e.left)} {e.op} {expr_name(e.right)}"
    if isinstance(e, Cast):
        return expr_name(e.child)
    if isinstance(e, Case):
        return "case"
    if isinstance(e, ScalarFn):
        return f"{e.name}({', '.join(expr_name(a) for a in e.args)})"
    if isinstance(e, Like):
        return f"{expr_name(e.child)} LIKE {e.pattern!r}"
    if isinstance(e, IsNull):
        return f"{expr_name(e.child)} IS {'NOT ' if e.negated else ''}NULL"
    if isinstance(e, Not):
        return f"NOT {expr_name(e.child)}"
    if isinstance(e, Neg):
        return f"-{expr_name(e.child)}"
    if isinstance(e, InList):
        return f"{expr_name(e.child)} IN (...)"
    if isinstance(e, Between):
        return f"{expr_name(e.child)} BETWEEN"
    # SQL-layer nodes (e.g. AggCall) duck-type through kind/arg
    kind = getattr(e, "kind", None)
    if kind is not None:
        if kind == "count_star":
            return "count(*)"
        arg = getattr(e, "arg", None)
        return f"{kind}({expr_name(arg) if arg is not None else '*'})"
    return type(e).__name__.lower()


def expr_columns(e: Expr) -> set:
    """Set of column names referenced by an expression."""
    out = set()

    def walk(x):
        if isinstance(x, Col):
            out.add(x.name)
        for f in dataclasses.fields(x):
            v = getattr(x, f.name)
            if isinstance(v, Expr):
                walk(v)
            elif isinstance(v, tuple):
                for item in v:
                    if isinstance(item, Expr):
                        walk(item)
                    elif isinstance(item, tuple):
                        for sub in item:
                            if isinstance(sub, Expr):
                                walk(sub)
    walk(e)
    return out


# ---------------------------------------------------------------------------
# Literal inference & date helpers
# ---------------------------------------------------------------------------

EPOCH = datetime.date(1970, 1, 1)


def parse_date(s: str) -> int:
    d = datetime.date.fromisoformat(s)
    return (d - EPOCH).days


def infer_lit_dtype(value: Any) -> DataType:
    if isinstance(value, bool):
        return BOOL
    if isinstance(value, int):
        return INT64
    if isinstance(value, float):
        return FLOAT64
    if isinstance(value, datetime.date):
        return DATE32
    if isinstance(value, str):
        return STRING
    raise TypeError(f"cannot infer literal type for {value!r}")


def add_months(days: int, months: int) -> int:
    d = EPOCH + datetime.timedelta(days=days)
    y = d.year + (d.month - 1 + months) // 12
    m = (d.month - 1 + months) % 12 + 1
    import calendar
    day = min(d.day, calendar.monthrange(y, m)[1])
    return (datetime.date(y, m, day) - EPOCH).days


# ---------------------------------------------------------------------------
# Bound expressions — compiled evaluators
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Bound:
    dtype: DataType
    nullable: bool
    # fn(batch) -> Column; closure over column indices / folded constants
    fn: Callable[[Batch], Column]
    # for string-producing exprs (e.g. substring): the derived sorted
    # dictionary the output codes index into
    dictionary: Optional[np.ndarray] = None
    # static exclusive upper bound on the value domain when known
    # (dictionary size, 2 for bool) — lets the aggregate planner use
    # direct composite group slots instead of a hash table
    code_bound: Optional[int] = None
    # ingest-time (lo, hi) value bounds for integer/date/decimal columns
    # (schema.int_bounds) — lets sort/join/group keys pack into shared
    # int64 limbs
    int_bound: Optional[tuple] = None
    # False for RAW string columns: `dictionary` is the column verbatim
    # (unsorted, duplicates; code == row index — schema.unsorted). LUT
    # predicates still work; code-ORDER semantics (range compares, sort,
    # min/max, joins, grouping) do not.
    dict_sorted: bool = True
    # static upper bound on the number of DISTINCT values this expression
    # can produce, when tighter than code_bound / the int_bound range
    # width (e.g. date_trunc('year') over 7 years of dates: range width
    # ~2500 days but only 7 distinct outputs). Feeds the aggregate
    # planner's group-count bound (output capacity / table sizing).
    ndv_bound: Optional[int] = None


def _const_column(value, dtype: DataType, valid: bool = True):
    def fn(batch: Batch) -> Column:
        cap = batch.capacity
        data = jnp.full((cap,), value, dtype=dtype.jnp_dtype)
        validity = jnp.full((cap,), valid, dtype=jnp.bool_)
        return Column(data, validity)
    return fn


def _decimal_rescale(data, from_scale: int, to_scale: int):
    if to_scale == from_scale:
        return data
    if to_scale > from_scale:
        return data * (10 ** (to_scale - from_scale))
    # scale down with round-half-up (toward +inf for positive, matches Arrow's
    # round-half-up on magnitudes for the divisors we use)
    f = 10 ** (from_scale - to_scale)
    return _div_round_half(data, jnp.int64(f))


def _div_round_half(num, den):
    """Integer division rounding half away from zero (SQL decimal rounding)."""
    num = num.astype(jnp.int64)
    den = den.astype(jnp.int64)
    sign = jnp.where((num < 0) != (den < 0), -1, 1).astype(jnp.int64)
    anum = jnp.abs(num)
    aden = jnp.abs(den)
    q = (anum + aden // 2) // jnp.maximum(aden, 1)
    return sign * q


# dictionary id -> (dict ref, sorted unique values, dense-rank LUT).
# The ref pins the array so a recycled id can't alias a dead dictionary.
_RECODE_CACHE: dict = {}


def sorted_recode(b: Bound) -> Bound:
    """Order-faithful re-encode of a RAW string Bound ('re-encode on
    demand').

    RAW codes are row indices: code equality != value equality and code
    order != lexicographic order, so grouping / sorting / min-max /
    range compares can't use them. This wraps the bound evaluator with a
    dense-rank LUT gather: output codes index the SORTED unique
    dictionary, restoring both properties exactly (no hashing, no
    collisions). The rank is computed by pyarrow's C++ kernels — no
    host object sort — once per raw dictionary and cached for the
    session, so SF100-scale comment columns only ever pay it when a
    query actually groups or orders by them. No-op for non-raw Bounds.
    """
    if b.dictionary is None or b.dict_sorted:
        return b
    key = id(b.dictionary)
    hit = _RECODE_CACHE.get(key)
    if hit is None or hit[0] is not b.dictionary:
        import pyarrow as pa
        import pyarrow.compute as pc
        try:
            arr = pa.array(b.dictionary, type=pa.string())
        except pa.lib.ArrowInvalid:
            # combined string data over 2 GiB needs 64-bit offsets
            arr = pa.array(b.dictionary, type=pa.large_string())
        if len(arr):
            ranks = pc.rank(arr, sort_keys="ascending", tiebreaker="dense")
            lut = (np.asarray(ranks) - 1).astype(np.int32)
            u = pc.unique(arr)
            uniq = np.asarray(pc.take(u, pc.sort_indices(u)), dtype=object)
        else:
            lut = np.zeros(1, np.int32)
            uniq = np.empty(0, dtype=object)
        hit = (b.dictionary, uniq, lut)
        _RECODE_CACHE[key] = hit
    _, uniq, lut = hit
    lut_dev = jnp.asarray(lut)
    inner = b.fn

    def fn(batch):
        col = inner(batch)
        idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
        return Column(lut_dev[idx], col.validity)

    n = max(len(uniq), 1)
    return Bound(b.dtype, b.nullable, fn, dictionary=uniq, code_bound=n,
                 dict_sorted=True, ndv_bound=n)


_POW10 = np.array([10 ** i for i in range(19)], dtype=np.int64)


def _div_scaled(a, b, m: int):
    """round(a * 10^m / b) for int64 mantissas without overflowing int64.

    Exact path (denominators < ~9.2e17, i.e. everything but near-int64-max
    sums): base-10 long division — q/r of a by b, then m unrolled
    shift-remainder steps, so a*10^m is never materialized (the int128 the
    reference gets from Arrow decimal128 sums, emulated in int64). Huge
    denominators fall back to rounding low digits off the denominator,
    keeping ~15 significant digits.
    """
    a = a.astype(jnp.int64)
    b = b.astype(jnp.int64)
    if m == 0:
        return _div_round_half(a, b)
    pow10 = jnp.asarray(_POW10)
    sign = jnp.where((a < 0) != (b < 0), -1, 1).astype(jnp.int64)
    aa = jnp.abs(a)
    ab = jnp.maximum(jnp.abs(b), 1)

    # exact long division (valid while r*10 can't overflow: ab <= ~9.2e17)
    q = aa // ab
    r = aa % ab
    for _ in range(m):
        r10 = r * 10
        q = q * 10 + r10 // ab
        r = r10 % ab
    q_exact = q + (2 * r >= ab).astype(jnp.int64)

    # approximate fallback for huge denominators
    digits = jnp.sum(aa[..., None] >= pow10[None, 1:], axis=-1).astype(jnp.int32)
    k1 = jnp.clip(18 - digits, 0, m)
    a1 = aa * jnp.take(pow10, k1, mode="clip")
    rem = (m - k1).astype(jnp.int32)
    bden = jnp.take(pow10, rem, mode="clip")
    b1 = jnp.maximum((ab + bden // 2) // bden, 1)
    q_approx = (a1 + b1 // 2) // b1

    q = jnp.where(ab <= jnp.int64(9 * 10**17), q_exact, q_approx)
    return sign * q


def _coerce_numeric(l: Bound, r: Bound):
    """Promote two numeric bound exprs to a common dtype; returns (dtype, fl, fr)
    where fl/fr map raw Columns to promoted data arrays."""
    lt, rt = l.dtype, r.dtype
    if lt.kind is TypeKind.DECIMAL or rt.kind is TypeKind.DECIMAL:
        # ints coerce to decimal scale 0; floats force float path
        if lt.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64) or rt.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64):
            out = FLOAT32

            def to_float(b: Bound):
                s = b.dtype.scale if b.dtype.kind is TypeKind.DECIMAL else 0
                div = float(10 ** s)
                return lambda c: c.data.astype(jnp.float32) / div
            return out, to_float(l), to_float(r)
        ls = lt.scale if lt.kind is TypeKind.DECIMAL else 0
        rs = rt.scale if rt.kind is TypeKind.DECIMAL else 0
        target = max(ls, rs)
        out = decimal(18, target)
        return (out,
                lambda c: _decimal_rescale(c.data.astype(jnp.int64), ls, target),
                lambda c: _decimal_rescale(c.data.astype(jnp.int64), rs, target))
    if lt.kind is TypeKind.FLOAT64 or rt.kind is TypeKind.FLOAT64:
        return FLOAT64, (lambda c: c.data.astype(jnp.float64)), (lambda c: c.data.astype(jnp.float64))
    if lt.kind is TypeKind.FLOAT32 or rt.kind is TypeKind.FLOAT32:
        return FLOAT32, (lambda c: c.data.astype(jnp.float32)), (lambda c: c.data.astype(jnp.float32))
    if lt.kind is TypeKind.INT64 or rt.kind is TypeKind.INT64:
        return INT64, (lambda c: c.data.astype(jnp.int64)), (lambda c: c.data.astype(jnp.int64))
    return INT32, (lambda c: c.data.astype(jnp.int32)), (lambda c: c.data.astype(jnp.int32))


def _bind_arith(op: str, l: Bound, r: Bound) -> Bound:
    lt, rt = l.dtype, r.dtype
    dec = lt.kind is TypeKind.DECIMAL or rt.kind is TypeKind.DECIMAL
    flo = lt.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64) or rt.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64)
    if dec and not flo:
        ls = lt.scale if lt.kind is TypeKind.DECIMAL else 0
        rs = rt.scale if rt.kind is TypeKind.DECIMAL else 0
        if op in ("+", "-"):
            ts = max(ls, rs)
            out = decimal(18, ts)

            def fn(batch):
                a = _decimal_rescale(l.fn(batch).data.astype(jnp.int64), ls, ts)
                b = _decimal_rescale(r.fn(batch).data.astype(jnp.int64), rs, ts)
                v = l.fn(batch).validity & r.fn(batch).validity
                return Column(a + b if op == "+" else a - b, v)
            return Bound(out, l.nullable or r.nullable, fn)
        if op == "*":
            ts = ls + rs
            out = decimal(18, ts)

            def fn(batch):
                lc, rc = l.fn(batch), r.fn(batch)
                return Column(lc.data.astype(jnp.int64) * rc.data.astype(jnp.int64),
                              lc.validity & rc.validity)
            return Bound(out, l.nullable or r.nullable, fn)
        if op == "/":
            # result scale: keep 4 extra digits beyond the wider input scale
            ts = min(max(ls, rs) + 4, 12)
            out = decimal(18, ts)
            m = ts - ls + rs  # result = a * 10^m / b

            def fn(batch):
                lc, rc = l.fn(batch), r.fn(batch)
                den = rc.data.astype(jnp.int64)
                q = _div_scaled(lc.data, den, m)
                v = lc.validity & rc.validity & (den != 0)
                return Column(q, v)
            return Bound(out, True, fn)
        if op == "%":
            # remainder at the wider scale; sign follows the dividend
            ts = max(ls, rs)
            out = decimal(18, ts)

            def fn(batch):
                lc, rc = l.fn(batch), r.fn(batch)
                a = _decimal_rescale(lc.data.astype(jnp.int64), ls, ts)
                b = _decimal_rescale(rc.data.astype(jnp.int64), rs, ts)
                bs = jnp.where(b == 0, jnp.ones_like(b), b)
                q = a // bs
                rem = a - q * bs
                q = q + ((rem != 0) & ((a < 0) != (bs < 0))).astype(q.dtype)
                v = lc.validity & rc.validity & (b != 0)
                return Column(a - q * bs, v)
            return Bound(out, True, fn)
        raise ValueError(f"unsupported decimal op {op}")
    out, fl, fr = _coerce_numeric(l, r)

    def fn(batch):
        lc, rc = l.fn(batch), r.fn(batch)
        a, b = fl(lc), fr(rc)
        if op == "+":
            d = a + b
        elif op == "-":
            d = a - b
        elif op == "*":
            d = a * b
        elif op in ("/", "%"):
            bs = jnp.where(b == 0, jnp.ones_like(b), b)
            if out.is_integer:
                # SQL/DataFusion semantics: / truncates toward zero and
                # % takes the dividend's sign (not Python floor division)
                q = a // bs
                rem = a - q * bs
                q = q + ((rem != 0) & ((a < 0) != (b < 0))).astype(q.dtype)
                d = q if op == "/" else a - q * bs
            else:
                d = a / bs if op == "/" else jnp.fmod(a, bs)
        else:
            raise ValueError(op)
        v = lc.validity & rc.validity
        if op in ("/", "%"):
            v = v & (b != 0)
        return Column(d.astype(out.jnp_dtype), v)
    return Bound(out, l.nullable or r.nullable or op in ("/", "%"), fn)


def _bind_compare(op: str, l: Bound, r: Bound) -> Bound:
    lt, rt = l.dtype, r.dtype
    if lt.kind is TypeKind.STRING and rt.kind is TypeKind.STRING:
        if not (l.dict_sorted and r.dict_sorted):
            # raw codes are row indices, not value identities
            raise NotImplementedError(
                "comparison between high-cardinality raw string columns "
                "(raise BALLISTA_RAW_DICT_MAX to dictionary-encode)")
        # both already code-space (same column's dict handled at bind_expr level)
        fl = lambda c: c.data
        fr = lambda c: c.data
    elif lt.kind is TypeKind.DATE32 or rt.kind is TypeKind.DATE32:
        fl = lambda c: c.data.astype(jnp.int32)
        fr = lambda c: c.data.astype(jnp.int32)
    else:
        _, fl, fr = _coerce_numeric(l, r)

    def fn(batch):
        lc, rc = l.fn(batch), r.fn(batch)
        a, b = fl(lc), fr(rc)
        if op == "=":
            d = a == b
        elif op in ("!=", "<>"):
            d = a != b
        elif op == "<":
            d = a < b
        elif op == "<=":
            d = a <= b
        elif op == ">":
            d = a > b
        elif op == ">=":
            d = a >= b
        else:
            raise ValueError(op)
        return Column(d, lc.validity & rc.validity)
    return Bound(BOOL, l.nullable or r.nullable, fn)


def _bind_bool(op: str, l: Bound, r: Bound) -> Bound:
    """Kleene three-valued AND/OR."""
    def fn(batch):
        lc, rc = l.fn(batch), r.fn(batch)
        a = lc.data & lc.validity if op == "and" else lc.data
        if op == "and":
            # false if either definitely false; null if unknown
            lv, rv = lc.validity, rc.validity
            lval = lc.data.astype(jnp.bool_)
            rval = rc.data.astype(jnp.bool_)
            result = lval & rval
            # valid if (both valid) or (either is definitely false)
            valid = (lv & rv) | (lv & ~lval) | (rv & ~rval)
            return Column(result & valid, valid)
        else:
            lv, rv = lc.validity, rc.validity
            lval = lc.data.astype(jnp.bool_)
            rval = rc.data.astype(jnp.bool_)
            result = (lval & lv) | (rval & rv)
            valid = (lv & rv) | (lv & lval) | (rv & rval)
            return Column(result, valid)
    return Bound(BOOL, l.nullable or r.nullable, fn)


def _string_lit_to_code(value: str, dictionary: np.ndarray, op: str):
    """Translate a string literal into dictionary-code space for comparison.

    For '=': exact code or sentinel -1 (never matches).
    For range ops: searchsorted position gives an equivalent code-space
    comparison because the dictionary is sorted.
    """
    if dictionary is None or len(dictionary) == 0:
        return -1, False
    d = dictionary.astype(str)
    pos = int(np.searchsorted(d, value))
    exact = pos < len(d) and d[pos] == value
    return pos, exact


def bind_expr(e: Expr, schema: Schema) -> Bound:
    """Bind a logical expression against a schema, producing an evaluator."""
    if isinstance(e, Alias):
        return bind_expr(e.child, schema)

    if isinstance(e, Col):
        idx = schema.index_of(e.name)
        f = schema.field(e.name)
        bound = None
        dic = schema.dictionary(e.name)
        if f.dtype.kind is TypeKind.STRING and dic is not None:
            bound = max(len(dic), 1)
        elif f.dtype.kind is TypeKind.BOOL:
            bound = 2
        srt = schema.is_sorted_dict(e.name)
        return Bound(f.dtype, f.nullable, lambda batch: batch.columns[idx],
                     dictionary=dic, code_bound=bound if srt else None,
                     int_bound=schema.int_bound(e.name), dict_sorted=srt)

    if isinstance(e, Lit):
        dtype = e.dtype or infer_lit_dtype(e.value)
        v = e.value
        if v is None:
            return Bound(dtype, True, _const_column(0, dtype, valid=False))
        if dtype.kind is TypeKind.STRING and isinstance(v, str):
            # standalone string literal: a one-entry dictionary, code 0
            # (lets CASE/value positions carry strings, not just compares)
            d = np.array([v], dtype=object)
            return Bound(STRING, False, _const_column(0, INT32),
                         dictionary=d, code_bound=1)
        if dtype.kind is TypeKind.DATE32 and isinstance(v, str):
            v = parse_date(v)
        elif dtype.kind is TypeKind.DATE32 and isinstance(v, datetime.date):
            v = (v - EPOCH).days
        elif dtype.kind is TypeKind.DECIMAL:
            from decimal import Decimal
            v = int(Decimal(str(v)).scaleb(dtype.scale).to_integral_value())
            # strip trailing zeros (100.00 -> 100 scale 0): keeps downstream
            # arithmetic scales — and int64 headroom — as small as possible
            scale = dtype.scale
            while scale > 0 and v % 10 == 0:
                v //= 10
                scale -= 1
            dtype = decimal(dtype.precision, scale)
        return Bound(dtype, False, _const_column(v, dtype))

    if isinstance(e, Cast):
        c = bind_expr(e.child, schema)
        src, dst = c.dtype, e.dtype

        def fn(batch):
            col = c.fn(batch)
            if src.kind is TypeKind.DECIMAL and dst.kind is TypeKind.DECIMAL:
                return Column(_decimal_rescale(col.data, src.scale, dst.scale), col.validity)
            if src.kind is TypeKind.DECIMAL and dst.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64):
                return Column((col.data.astype(dst.jnp_dtype) / (10 ** src.scale)), col.validity)
            if dst.kind is TypeKind.DECIMAL and src.is_integer:
                return Column(col.data.astype(jnp.int64) * (10 ** dst.scale), col.validity)
            if dst.kind is TypeKind.DECIMAL and src.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64):
                return Column(jnp.round(col.data * (10 ** dst.scale)).astype(jnp.int64), col.validity)
            return Column(col.data.astype(dst.jnp_dtype), col.validity)
        return Bound(dst, c.nullable, fn)

    if isinstance(e, BinOp):
        # constant-fold date +/- interval
        if isinstance(e.right, IntervalLit) and e.op in ("+", "-"):
            l = bind_expr(e.left, schema)
            iv = e.right
            months = iv.months if e.op == "+" else -iv.months
            days = iv.days if e.op == "+" else -iv.days
            if isinstance(e.left, Lit):
                base = bind_expr(e.left, schema)
                # evaluate on host
                day0 = e.left.value
                if isinstance(day0, str):
                    day0 = parse_date(day0)
                folded = add_months(day0, months) + days
                return Bound(DATE32, False, _const_column(folded, DATE32))
            raise NotImplementedError("interval arithmetic on non-literal dates")
        l = bind_expr(e.left, schema)
        r = bind_expr(e.right, schema)
        # string vs literal: translate literal into code space
        if l.dtype.kind is TypeKind.STRING and isinstance(e.right, Lit):
            dic = l.dictionary if l.dictionary is not None else _dict_for(e.left, schema)
            if not l.dict_sorted:
                # RAW (unsorted) dictionary: equality via a boolean LUT
                # over the values (same mechanism as LIKE, cheaper than a
                # recode); range compares re-encode on demand so code
                # order is lexicographic, then fall through to the
                # sorted-dictionary logic below
                if e.op in ("=", "!=", "<>"):
                    lut = np.asarray(dic.astype(str) == str(e.right.value))
                    if e.op in ("!=", "<>"):
                        lut = ~lut
                    lut_dev = (jnp.asarray(lut) if len(lut)
                               else jnp.zeros(1, bool))
                    lb = l

                    def fn(batch):
                        col = lb.fn(batch)
                        idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
                        return Column(lut_dev[idx] & col.validity,
                                      col.validity)
                    return Bound(BOOL, l.nullable, fn)
                l = sorted_recode(l)
                dic = l.dictionary
            pos, exact = _string_lit_to_code(str(e.right.value), dic, e.op)
            if e.op == "=" and not exact:
                return Bound(BOOL, False, _const_column(False, BOOL))
            if e.op in ("!=", "<>") and not exact:
                return Bound(BOOL, False, _const_column(True, BOOL))
            # for range ops on a sorted dict, searchsorted pos works:
            #   col < lit  <=>  code < pos       (strings >= lit start at pos)
            #   col <= lit <=>  code <= pos-1+exact
            code = pos if e.op in ("<", ">=", "=", "!=", "<>") else (pos - 1 + (1 if exact else 0))
            r = Bound(STRING, False, _const_column(code, STRING))
        if r.dtype.kind is TypeKind.STRING and isinstance(e.left, Lit):
            # mirror: lit OP col -> col flipped-OP lit
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!=", "<>": "<>"}
            return bind_expr(BinOp(flip[e.op], e.right, e.left), schema)
        # date vs string literal
        if l.dtype.kind is TypeKind.DATE32 and r.dtype.kind is TypeKind.STRING and isinstance(e.right, Lit):
            r = bind_expr(Lit(parse_date(str(e.right.value)), DATE32), schema)
        if e.op in ("+", "-", "*", "/", "%"):
            return _bind_arith(e.op, l, r)
        if e.op in ("=", "!=", "<>", "<", "<=", ">", ">="):
            return _bind_compare(e.op, l, r)
        if e.op in ("and", "or"):
            return _bind_bool(e.op, l, r)
        raise ValueError(f"unknown op {e.op}")

    if isinstance(e, Not):
        c = bind_expr(e.child, schema)

        def fn(batch):
            col = c.fn(batch)
            return Column(~col.data.astype(jnp.bool_) & col.validity, col.validity)
        return Bound(BOOL, c.nullable, fn)

    if isinstance(e, Neg):
        c = bind_expr(e.child, schema)

        def fn(batch):
            col = c.fn(batch)
            return Column(-col.data, col.validity)
        return Bound(c.dtype, c.nullable, fn)

    if isinstance(e, IsNull):
        c = bind_expr(e.child, schema)
        neg = e.negated

        def fn(batch):
            col = c.fn(batch)
            d = col.validity if neg else ~col.validity
            return Column(d, jnp.ones_like(col.validity))
        return Bound(BOOL, False, fn)

    if isinstance(e, Between):
        lo = BinOp(">=", e.child, e.low)
        hi = BinOp("<=", e.child, e.high)
        both = BinOp("and", lo, hi)
        return bind_expr(Not(both) if e.negated else both, schema)

    if isinstance(e, InList):
        c = bind_expr(e.child, schema)
        if c.dtype.kind is TypeKind.STRING:
            dic = c.dictionary if c.dictionary is not None else _dict_for(e.child, schema)
            if not c.dict_sorted:
                # raw dictionary: vectorized membership over the values
                vals = [str(v.value) for v in e.values]
                lut = np.isin(dic.astype(str), vals)
                lut = np.concatenate([lut, np.zeros(1, bool)]) if not len(lut) else lut
            else:
                codes = []
                for v in e.values:
                    assert isinstance(v, Lit)
                    pos, exact = _string_lit_to_code(str(v.value), dic, "=")
                    if exact:
                        codes.append(pos)
                lut = np.zeros(max(len(dic) if dic is not None else 0, 1), dtype=bool)
                for code in codes:
                    lut[code] = True
            lut_dev = jnp.asarray(lut)
            neg = e.negated

            def fn(batch):
                col = c.fn(batch)
                idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
                d = lut_dev[idx]
                d = ~d if neg else d
                return Column(d & col.validity, col.validity)
            return Bound(BOOL, c.nullable, fn)
        vals = []
        for v in e.values:
            assert isinstance(v, Lit)
            b = bind_expr(Lit(v.value, v.dtype or c.dtype if c.dtype.kind is TypeKind.DATE32 else v.dtype), schema)
            vals.append(v.value if not isinstance(v.value, str) else parse_date(v.value))
        arr = jnp.asarray(np.array(vals))
        neg = e.negated

        def fn(batch):
            col = c.fn(batch)
            d = jnp.isin(col.data, arr)
            d = ~d if neg else d
            return Column(d & col.validity, col.validity)
        return Bound(BOOL, c.nullable, fn)

    if isinstance(e, Like):
        c = bind_expr(e.child, schema)
        if c.dtype.kind is not TypeKind.STRING:
            raise TypeError("LIKE on non-string")
        dic = c.dictionary if c.dictionary is not None else _dict_for(e.child, schema)
        # SQL LIKE evaluated over the (host) dictionary. pyarrow's
        # match_like is vectorized C++ — load-bearing for RAW
        # high-cardinality dictionaries (an entry-at-a-time Python regex
        # loop over SF100's ~450M comments would take hours)
        n = len(dic) if dic is not None else 0
        if n:
            try:
                import pyarrow as pa
                import pyarrow.compute as pc
                lut = np.asarray(pc.match_like(
                    pa.array(dic.astype(str)), e.pattern)).astype(bool)
            except Exception:
                pat = re.escape(e.pattern).replace(r"%", ".*").replace(r"_", ".")
                rx = re.compile("^" + pat + "$", re.S)
                lut = np.fromiter((bool(rx.match(str(v))) for v in dic),
                                  dtype=bool, count=n)
        else:
            lut = np.zeros(1, dtype=bool)
        if e.negated:
            lut = ~lut
        lut_dev = jnp.asarray(lut)

        def fn(batch):
            col = c.fn(batch)
            idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
            return Column(lut_dev[idx] & col.validity, col.validity)
        return Bound(BOOL, c.nullable, fn)

    if isinstance(e, Case):
        whens = [(bind_expr(c, schema), bind_expr(v, schema)) for c, v in e.whens]
        otherwise = bind_expr(e.otherwise, schema) if e.otherwise is not None else None
        # unify result dtype
        dtypes = [v.dtype for _, v in whens] + ([otherwise.dtype] if otherwise else [])
        out = _common_dtype(dtypes)

        if out.kind is TypeKind.STRING:
            # string branches carry codes in DIFFERENT dictionaries:
            # remap every branch into the sorted union dictionary via
            # host LUTs before selecting
            branches = [v for _, v in whens] + ([otherwise] if otherwise else [])
            dics = [b.dictionary for b in branches]
            if any(d is None for d in dics):
                raise TypeError("CASE string branches must be "
                                "dictionary-encoded or literals")
            union = np.unique(np.concatenate(
                [d.astype(str) for d in dics if len(d)])).astype(object)
            luts = [jnp.asarray(
                np.searchsorted(union.astype(str), d.astype(str)
                                ).astype(np.int32)
                if len(d) else np.zeros(1, np.int32)) for d in dics]

            def remap(col, lut):
                idx = jnp.clip(col.data, 0, lut.shape[0] - 1)
                return Column(lut[idx], col.validity)

            def fn(batch):
                if otherwise is not None:
                    oc = remap(otherwise.fn(batch), luts[-1])
                    data, valid = oc.data, oc.validity
                else:
                    fc = remap(whens[0][1].fn(batch), luts[0])
                    data = jnp.zeros_like(fc.data)
                    valid = jnp.zeros_like(fc.validity)
                for i in range(len(whens) - 1, -1, -1):
                    cond, val = whens[i]
                    cc = cond.fn(batch)
                    vc = remap(val.fn(batch), luts[i])
                    take = cc.data.astype(jnp.bool_) & cc.validity
                    data = jnp.where(take, vc.data, data)
                    valid = jnp.where(take, vc.validity, valid)
                return Column(data, valid)
            return Bound(STRING, True, fn, dictionary=union,
                         code_bound=max(len(union), 1))

        def fn(batch):
            if otherwise is not None:
                oc = _cast_col(otherwise.fn(batch), otherwise.dtype, out)
                data, valid = oc.data, oc.validity
            else:
                first = whens[0][1]
                fc = _cast_col(first.fn(batch), first.dtype, out)
                data = jnp.zeros_like(fc.data)
                valid = jnp.zeros_like(fc.validity)
            for cond, val in reversed(whens):
                cc = cond.fn(batch)
                vc = _cast_col(val.fn(batch), val.dtype, out)
                take = cc.data.astype(jnp.bool_) & cc.validity
                data = jnp.where(take, vc.data, data)
                valid = jnp.where(take, vc.validity, valid)
            return Column(data, valid)
        return Bound(out, True, fn)

    if isinstance(e, ScalarFn):
        return _bind_scalar_fn(e, schema)

    raise TypeError(f"cannot bind {e!r}")


def _dict_for(e: Expr, schema: Schema):
    if isinstance(e, Alias):
        return _dict_for(e.child, schema)
    if isinstance(e, Col):
        return schema.dictionary(e.name)
    return None


def _common_dtype(dtypes):
    out = dtypes[0]
    for d in dtypes[1:]:
        if d == out:
            continue
        if d.kind is TypeKind.DECIMAL and out.kind is TypeKind.DECIMAL:
            out = decimal(18, max(d.scale, out.scale))
        elif d.kind is TypeKind.DECIMAL and out.is_integer:
            out = d
        elif out.kind is TypeKind.DECIMAL and d.is_integer:
            pass
        elif d.kind is TypeKind.FLOAT64 or out.kind is TypeKind.FLOAT64:
            out = FLOAT64
        elif d.kind is TypeKind.FLOAT32 or out.kind is TypeKind.FLOAT32:
            out = FLOAT32
        elif d.kind is TypeKind.INT64 or out.kind is TypeKind.INT64:
            out = INT64
    return out


def _cast_col(col: Column, src: DataType, dst: DataType) -> Column:
    if src == dst:
        return col
    if src.kind is TypeKind.DECIMAL and dst.kind is TypeKind.DECIMAL:
        return Column(_decimal_rescale(col.data, src.scale, dst.scale), col.validity)
    if src.is_integer and dst.kind is TypeKind.DECIMAL:
        return Column(col.data.astype(jnp.int64) * (10 ** dst.scale), col.validity)
    return Column(col.data.astype(dst.jnp_dtype), col.validity)


# User-defined scalar functions (the reference's dlopen UDF plugin system,
# core/src/plugin/udf.rs, re-imagined as jittable JAX callables).
_UDF_REGISTRY: dict = {}


def register_udf(name: str, fn, out_dtype: DataType,
                 propagate_nulls: bool = True) -> None:
    """fn(*data_arrays) -> data_array, traced into the stage program."""
    _UDF_REGISTRY[name.lower()] = (fn, out_dtype, propagate_nulls)


def _bind_scalar_fn(e: ScalarFn, schema: Schema) -> Bound:
    name = e.name.lower()
    if name in _UDF_REGISTRY:
        fn_impl, out_dtype, prop = _UDF_REGISTRY[name]
        parts = [bind_expr(a, schema) for a in e.args]

        def fn(batch):
            cols = [p.fn(batch) for p in parts]
            data = fn_impl(*[c.data for c in cols]).astype(out_dtype.jnp_dtype)
            if prop and cols:
                valid = cols[0].validity
                for c in cols[1:]:
                    valid = valid & c.validity
            else:
                valid = jnp.ones(batch.capacity, dtype=jnp.bool_)
            return Column(data, valid)
        return Bound(out_dtype, True, fn)
    if name in ("extract_year", "extract_month", "extract_day"):
        c = bind_expr(e.args[0], schema)
        part = name.split("_")[1]

        def fn(batch):
            col = c.fn(batch)
            # days since 1970-01-01 -> (y, m, d), civil-calendar algorithm
            # (Howard Hinnant's days->ymd, vectorized; no Python dates)
            z = col.data.astype(jnp.int32) + 719468
            era = jnp.where(z >= 0, z, z - 146096) // 146097
            doe = z - era * 146097
            yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
            y = yoe + era * 400
            doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
            mp = (5 * doy + 2) // 153
            d = doy - (153 * mp + 2) // 5 + 1
            m = jnp.where(mp < 10, mp + 3, mp - 9)
            year = jnp.where(m <= 2, y + 1, y)
            out = {"year": year, "month": m, "day": d}[part]
            return Column(out.astype(jnp.int32), col.validity)
        # derived value bounds: extract(year) of a bounded date column is
        # itself tightly bounded (e.g. TPC-H order years span 1992-1998) —
        # this feeds key packing AND the aggregate group-count bound
        ib = None
        if part == "month":
            ib = (1, 12)
        elif part == "day":
            ib = (1, 31)
        elif c.int_bound is not None:
            lo, hi = c.int_bound
            ib = ((EPOCH + datetime.timedelta(days=int(lo))).year,
                  (EPOCH + datetime.timedelta(days=int(hi))).year)
        return Bound(INT32, c.nullable, fn, int_bound=ib)
    if name == "date_trunc":
        unit = e.args[0].value.lower() if isinstance(e.args[0], Lit) else None
        if unit not in ("year", "month"):
            raise NotImplementedError(f"date_trunc unit {unit!r}")
        c = bind_expr(e.args[1], schema)

        def fn(batch):
            col = c.fn(batch)
            z = col.data.astype(jnp.int32) + 719468
            era = jnp.where(z >= 0, z, z - 146096) // 146097
            doe = z - era * 146097
            yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
            y = yoe + era * 400
            doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
            mp = (5 * doy + 2) // 153
            m = jnp.where(mp < 10, mp + 3, mp - 9)
            year = jnp.where(m <= 2, y + 1, y)
            if unit == "year":
                ty, tm = year, jnp.ones_like(m)
            else:
                ty, tm = year, m
            # ymd -> days (Hinnant days_from_civil), day = 1
            yy = ty - (tm <= 2)
            era2 = jnp.where(yy >= 0, yy, yy - 399) // 400
            yoe2 = yy - era2 * 400
            mp2 = jnp.where(tm > 2, tm - 3, tm + 9)
            doy2 = (153 * mp2 + 2) // 5  # day-of-month 1 -> +0
            doe2 = yoe2 * 365 + yoe2 // 4 - yoe2 // 100 + doy2
            days = era2 * 146097 + doe2 - 719468
            return Column(days.astype(jnp.int32), col.validity)
        # truncation keeps the value within [trunc(lo), hi]; the distinct
        # count is the number of year/month starts in the range
        ib = ndv = None
        if c.int_bound is not None:
            lo, hi = c.int_bound
            dlo = EPOCH + datetime.timedelta(days=int(lo))
            dhi = EPOCH + datetime.timedelta(days=int(hi))
            tlo = (datetime.date(dlo.year, 1, 1) if unit == "year"
                   else datetime.date(dlo.year, dlo.month, 1))
            ib = ((tlo - EPOCH).days, int(hi))
            if unit == "year":
                ndv = dhi.year - dlo.year + 1
            else:
                ndv = (dhi.year - dlo.year) * 12 + dhi.month - dlo.month + 1
        return Bound(c.dtype, c.nullable, fn, int_bound=ib, ndv_bound=ndv)
    if name in ("floor", "ceil", "ceiling", "round", "sqrt"):
        c = bind_expr(e.args[0], schema)
        op = {"floor": jnp.floor, "ceil": jnp.ceil, "ceiling": jnp.ceil,
              "round": jnp.round, "sqrt": jnp.sqrt}[name]
        if c.dtype.kind is TypeKind.DECIMAL:
            scale = 10.0 ** c.dtype.scale

            def fn(batch):
                col = c.fn(batch)
                v = op(col.data.astype(jnp.float64) / scale)
                return Column(v, col.validity)
            return Bound(FLOAT64, c.nullable, fn)
        out_dt = FLOAT64 if (name == "sqrt" or c.dtype.is_integer is False) \
            else c.dtype

        def fn(batch):
            col = c.fn(batch)
            if name == "sqrt":
                v = jnp.sqrt(col.data.astype(jnp.float64))
            elif c.dtype.is_integer:
                v = col.data  # floor/ceil/round of integers: identity
            else:
                v = op(col.data)
            return Column(v.astype(out_dt.jnp_dtype), col.validity)
        return Bound(out_dt, c.nullable, fn)
    if name == "abs":
        c = bind_expr(e.args[0], schema)
        return Bound(c.dtype, c.nullable,
                     lambda batch: Column(jnp.abs(c.fn(batch).data), c.fn(batch).validity))
    if name == "substring":
        c = bind_expr(e.args[0], schema)
        if c.dtype.kind is not TypeKind.STRING:
            raise TypeError("substring on non-string")
        dic = _dict_for(e.args[0], schema)
        if dic is None:
            raise TypeError("substring requires a dictionary-encoded column")
        start = e.args[1].value  # 1-based
        length = e.args[2].value
        subs = np.array([
            (str(s)[start - 1:] if length < 0
             else str(s)[start - 1:start - 1 + length]) for s in dic],
            dtype=object)
        new_dict = np.unique(subs.astype(str)).astype(object)
        lut = np.searchsorted(new_dict.astype(str), subs.astype(str)).astype(np.int32)
        lut_dev = jnp.asarray(lut)

        def fn(batch):
            col = c.fn(batch)
            idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
            return Column(lut_dev[idx], col.validity)
        return Bound(STRING, c.nullable, fn, dictionary=new_dict)
    _DICT_STR_FNS = {"upper": str.upper, "lower": str.lower,
                     "trim": str.strip, "ltrim": str.lstrip,
                     "rtrim": str.rstrip, "reverse": lambda s: s[::-1]}
    if name in _DICT_STR_FNS or (
            name == "replace" and len(e.args) == 3
            and all(isinstance(a, Lit) for a in e.args[1:])):
        # string -> string on a dictionary column: transform the HOST
        # dictionary once, re-sort, and trace one LUT gather over codes
        # (the substring pattern — no per-row string work on device)
        c = bind_expr(e.args[0], schema)
        if c.dtype.kind is not TypeKind.STRING:
            raise TypeError(f"{name} on non-string")
        dic = _dict_for(e.args[0], schema)
        if dic is None:
            raise TypeError(f"{name} requires a dictionary-encoded column")
        if name == "replace":
            old, new = e.args[1].value, e.args[2].value
            xform = lambda s: str(s).replace(old, new)  # noqa: E731
        else:
            base = _DICT_STR_FNS[name]
            xform = lambda s: base(str(s))  # noqa: E731
        vals = np.array([xform(s) for s in dic], dtype=object)
        new_dict = np.unique(vals.astype(str)).astype(object)
        lut = np.searchsorted(new_dict.astype(str),
                              vals.astype(str)).astype(np.int32)
        lut_dev = jnp.asarray(lut if len(lut) else np.zeros(1, np.int32))

        def fn(batch):
            col = c.fn(batch)
            idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
            return Column(lut_dev[idx], col.validity)
        return Bound(STRING, c.nullable, fn, dictionary=new_dict,
                     code_bound=max(len(new_dict), 1))
    if name in ("length", "char_length", "character_length",
                "octet_length"):
        c = bind_expr(e.args[0], schema)
        if c.dtype.kind is not TypeKind.STRING:
            raise TypeError(f"{name} on non-string")
        dic = _dict_for(e.args[0], schema)
        if dic is None:
            raise TypeError(f"{name} requires a dictionary-encoded column")
        enc = (len(str(s).encode()) if name == "octet_length" else len(str(s))
               for s in dic)
        lens = np.fromiter(enc, dtype=np.int32, count=len(dic))
        lut_dev = jnp.asarray(lens if len(lens) else np.zeros(1, np.int32))

        def fn(batch):
            col = c.fn(batch)
            idx = jnp.clip(col.data, 0, lut_dev.shape[0] - 1)
            return Column(lut_dev[idx], col.validity)
        return Bound(INT32, c.nullable, fn)
    if name == "concat":
        # concat over dict columns and literals: at most two dict columns
        # (product dictionary, bounded); all string work stays host-side
        parts = []
        for a in e.args:
            if isinstance(a, Lit):
                parts.append(("lit", str(a.value), None))
            else:
                c = bind_expr(a, schema)
                if c.dtype.kind is not TypeKind.STRING or c.dictionary is None:
                    raise TypeError("concat requires dictionary-encoded "
                                    "string columns or literals")
                parts.append(("col", c, c.dictionary))
        cols = [p for p in parts if p[0] == "col"]
        if len(cols) == 0 or len(cols) > 2:
            raise NotImplementedError("concat supports 1-2 string columns")
        if len(cols) == 2 and len(cols[0][2]) * len(cols[1][2]) > 1_000_000:
            raise NotImplementedError("concat dictionary product too large")

        def render(v1, v2=None):
            out, seen = [], 0
            for kind, val, _ in parts:
                if kind == "lit":
                    out.append(val)
                else:
                    out.append(str(v1 if seen == 0 else v2))
                    seen += 1
            return "".join(out)

        import itertools
        if len(cols) == 1:
            d1 = cols[0][2]
            vals = np.array([render(s) for s in d1], dtype=object)
        else:
            d1, d2 = cols[0][2], cols[1][2]
            vals = np.array([render(s1, s2)
                             for s1, s2 in itertools.product(d1, d2)],
                            dtype=object)
        new_dict = np.unique(vals.astype(str)).astype(object)
        lut = np.searchsorted(new_dict.astype(str),
                              vals.astype(str)).astype(np.int32)
        lut_dev = jnp.asarray(lut if len(lut) else np.zeros(1, np.int32))
        c1 = cols[0][1]
        c2 = cols[1][1] if len(cols) == 2 else None

        def fn(batch):
            a1 = c1.fn(batch)
            if c2 is None:
                idx = jnp.clip(a1.data, 0, lut_dev.shape[0] - 1)
                valid = a1.validity
            else:
                a2 = c2.fn(batch)
                m = len(cols[1][2])
                idx = jnp.clip(a1.data * m + a2.data, 0,
                               lut_dev.shape[0] - 1)
                valid = a1.validity & a2.validity
            return Column(lut_dev[idx], valid)
        return Bound(STRING, True, fn, dictionary=new_dict,
                     code_bound=max(len(new_dict), 1))
    if name == "coalesce":
        parts = [bind_expr(a, schema) for a in e.args]
        out = _common_dtype([p.dtype for p in parts])

        def fn(batch):
            cols = [_cast_col(p.fn(batch), p.dtype, out) for p in parts]
            data = cols[-1].data
            valid = cols[-1].validity
            for col in reversed(cols[:-1]):
                data = jnp.where(col.validity, col.data, data)
                valid = valid | col.validity
            return Column(data, valid)
        return Bound(out, all(p.nullable for p in parts), fn)
    raise NotImplementedError(f"scalar function {e.name}")


def propagate_bounds(exprs, names, in_schema: Schema) -> dict:
    """{out_name: (lo, hi)} for passthrough (possibly aliased) columns —
    the int-bounds analog of per-site dictionary propagation."""
    out = {}
    for e, n in zip(exprs, names):
        base = e.child if isinstance(e, Alias) else e
        if isinstance(base, Col):
            b = in_schema.int_bound(base.name)
            if b is not None:
                out[n] = b
    return out


def output_field(e: Expr, schema: Schema) -> Field:
    b = bind_expr(e, schema)
    return Field(expr_name(e), b.dtype, b.nullable)
