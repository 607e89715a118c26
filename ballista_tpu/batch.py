"""Fixed-shape SoA columnar device batches.

This replaces Arrow `RecordBatch` (the unit of data in the reference engine —
DataFusion streams of RecordBatches, e.g. `shuffle_writer.rs:341-392` iterates
them) with a TPU-friendly representation:

- Every column is a 1-D device array of a fixed, padding-rounded *capacity*
  plus a boolean validity array of the same capacity.
- The number of live rows is a device int32 scalar `num_rows`; rows
  [num_rows, capacity) are padding and always invalid.
- Live rows are densely packed at the front (operators maintain this
  invariant; `compact` restores it after filtering).

A `Batch` is a JAX pytree (NamedTuple of arrays) so whole operator chains
jit-compile into a single XLA program per stage. Schemas (dtypes, string
dictionaries) are host-side planning metadata in `schema.Schema` and never
enter the traced program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .schema import DataType, Field, Schema, TypeKind

# Pad capacities to lane multiples so XLA tiles cleanly onto the VPU.
LANE = 128


def round_capacity(n: int) -> int:
    return max(LANE, -(-int(n) // LANE) * LANE)


def bucket_capacity(n: int) -> int:
    """Smallest quarter-octave geometric tier >= n (lane-rounded).

    Shape bucketing for the persistent compile cache (SURVEY §7 'dynamic
    shapes vs jit'): pad capacities to tiers LANE*2^(i/4) so any data
    whose row count moves by <19% reuses the same compiled stage
    programs instead of paying a fresh multi-minute TPU compile. Enabled
    per session with SessionContext(capacity_mode='bucket') /
    ballista.capacity.mode=bucket."""
    import math
    n = int(n)
    if n <= LANE:
        return LANE
    i = math.ceil(4 * math.log2(n / LANE))
    return round_capacity(math.ceil(LANE * 2 ** (i / 4)))


class Column(NamedTuple):
    data: jax.Array      # (capacity,) typed per DataType.jnp_dtype
    validity: jax.Array  # (capacity,) bool


class Batch(NamedTuple):
    """Fixed-capacity SoA batch.

    Dense form (live=None): rows 0..num_rows-1 are the live rows.
    Sparse form (live set): live rows are scattered — `live` marks them and
    num_rows == live.sum(). Sparse batches exist only between a producer
    that elides its output compaction (inner/semi/anti join, filter) and a
    statically-declared mask-aware consumer (aggregate, sort, join input,
    filter); the planner (exec/plan.py _plan_sparse_flow) guarantees no
    other operator ever sees one.
    """
    columns: Tuple[Column, ...]
    num_rows: jax.Array  # () int32
    live: Optional[jax.Array] = None  # (capacity,) bool, or None if dense

    @property
    def capacity(self) -> int:
        return int(self.columns[0].data.shape[0]) if self.columns else 0

    def column(self, i: int) -> Column:
        return self.columns[i]

    def replace_columns(self, columns) -> "Batch":
        return Batch(tuple(columns), self.num_rows, self.live)


def row_mask(batch: Batch) -> jax.Array:
    """Boolean (capacity,) mask of live rows."""
    if batch.live is not None:
        return batch.live
    cap = batch.capacity
    idx = jnp.arange(cap, dtype=jnp.int32)
    return idx < batch.num_rows


def make_column(values: np.ndarray, validity: np.ndarray, dtype: DataType,
                capacity: int) -> Column:
    n = len(values)
    assert n <= capacity
    data = np.zeros(capacity, dtype=np.dtype(dtype.jnp_dtype.name if hasattr(dtype.jnp_dtype, "name") else dtype.jnp_dtype))
    data[:n] = values
    valid = np.zeros(capacity, dtype=bool)
    valid[:n] = validity
    return Column(jnp.asarray(data), jnp.asarray(valid))


def empty_like_schema(schema: Schema, capacity: int) -> Batch:
    cols = []
    for f in schema.fields:
        cols.append(Column(
            jnp.zeros(capacity, dtype=f.dtype.jnp_dtype),
            jnp.zeros(capacity, dtype=jnp.bool_),
        ))
    return Batch(tuple(cols), jnp.int32(0))


# ---------------------------------------------------------------------------
# Arrow / host interop (ingest + result egress + oracle diffing)
# ---------------------------------------------------------------------------

def _np_dtype_for(dtype: DataType):
    return {
        TypeKind.BOOL: np.bool_,
        TypeKind.INT32: np.int32,
        TypeKind.INT64: np.int64,
        TypeKind.FLOAT32: np.float32,
        TypeKind.FLOAT64: np.float64,
        TypeKind.DATE32: np.int32,
        TypeKind.DECIMAL: np.int64,
        TypeKind.STRING: np.int32,
    }[dtype.kind]


def schema_from_arrow(arrow_schema) -> Schema:
    import pyarrow as pa

    fields = []
    for f in arrow_schema:
        t = f.type
        if pa.types.is_boolean(t):
            dt = DataType(TypeKind.BOOL)
        elif pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
            dt = DataType(TypeKind.INT32)
        elif pa.types.is_int64(t):
            dt = DataType(TypeKind.INT64)
        elif pa.types.is_float32(t):
            dt = DataType(TypeKind.FLOAT32)
        elif pa.types.is_float64(t):
            dt = DataType(TypeKind.FLOAT64)
        elif pa.types.is_date32(t):
            dt = DataType(TypeKind.DATE32)
        elif pa.types.is_decimal(t):
            dt = DataType(TypeKind.DECIMAL, t.precision, t.scale)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            dt = DataType(TypeKind.STRING)
        else:
            raise TypeError(f"unsupported arrow type {t} for column {f.name}")
        fields.append(Field(f.name, dt, f.nullable))
    return Schema(tuple(fields))


def compute_dictionaries(table) -> dict:
    """Global sorted dictionaries for every string column of a table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = {}
    for field in table.schema:
        if pa.types.is_string(field.type) or pa.types.is_large_string(field.type):
            uniq = pc.unique(pc.drop_null(table.column(field.name)))
            out[field.name] = np.sort(np.asarray(uniq, dtype=object)).astype(object)
    return out


def _estimate_high_cardinality(arr, n: int) -> bool:
    """Sample-estimated distinct count above BALLISTA_RAW_DICT_MAX?

    A uniform 64Ki sample's unique ratio scaled to n over-estimates NDV
    for skewed columns (safe direction: sorted encoding stays available
    for genuinely low-NDV data; raw mode only for dictionary sizes that
    would rival the data itself)."""
    import os
    limit = int(os.environ.get("BALLISTA_RAW_DICT_MAX", str(1 << 21)))
    if n <= limit:
        return False
    import pyarrow.compute as pc
    step = max(1, n // 65536)
    sample = arr.take(np.arange(0, n, step, dtype=np.int64))
    uniq = len(pc.unique(sample))
    est = uniq / max(len(sample), 1) * n
    return est > limit


def ingest_column_host(arr, f, n: int, dictionaries: dict | None = None):
    """Host half of ingest for ONE column: arrow array -> numpy codes/values.

    Returns (values, validity, dict_np|None, is_raw, bounds|None).
    Strings are dictionary-encoded against a *sorted* dictionary so that
    code order == lexicographic order (ORDER BY / min / max work on codes);
    high-cardinality strings fall back to RAW mode (code == row index).
    Pass `dictionaries` to encode against precomputed global dictionaries
    (required when converting shards of one table so codes agree)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        if (arr.num_chunks and pa.types.is_string(arr.type)
                and arr.nbytes >= (1 << 31) - (1 << 24)):
            # int32 offsets overflow when a combined string column nears
            # 2 GiB (SF10 l_comment is ~2.2 GiB): widen to large_string
            # first; every downstream consumer (fill_null, take,
            # np.asarray to object) handles 64-bit offsets
            arr = arr.cast(pa.large_string())
        arr = arr.combine_chunks() if arr.num_chunks else pa.array([], type=arr.type)
    validity = np.ones(n, dtype=bool)
    if arr.null_count:
        validity = np.asarray(pc.is_valid(arr))
    dict_np = None
    bounds = None
    if f.dtype.kind is TypeKind.STRING:
        from . import native
        filled = arr.fill_null("") if arr.null_count else arr
        values = None
        if (dictionaries is None or f.name not in dictionaries) and \
                _estimate_high_cardinality(filled, n):
            # RAW string mode: the "dictionary" is the column verbatim
            # (unsorted, duplicates allowed; code == row index). At
            # TPC-H SF100 sorted-dictionary encoding of ~450M distinct
            # comments is infeasible (O(n log n) host sort + a
            # dictionary as large as the data); raw mode is O(1).
            # Predicates (LIKE/=/IN) evaluate host-side into boolean
            # LUTs exactly as for sorted dictionaries; key uses
            # re-encode on demand (schema.unsorted guards).
            return (np.arange(n, dtype=np.int32), validity,
                    np.asarray(filled, dtype=object), True, None)
        if dictionaries is not None and f.name in dictionaries:
            dict_np = dictionaries[f.name]
            codes = native.dict_encode_against_arrow(filled, dict_np)
            if codes is not None:
                values = np.where(validity & (codes >= 0), codes, 0).astype(np.int32)
        else:
            res = native.dict_encode_arrow(filled) if not arr.null_count else None
            if res is not None:
                codes, dict_np = res
                values = np.where(validity, codes, 0).astype(np.int32)
            else:
                uniq = pc.unique(pc.drop_null(arr))
                dict_np = np.sort(np.asarray(uniq, dtype=object))
        dict_np = dict_np.astype(object)
        if values is None:
            str_np = np.asarray(arr, dtype=object)
            codes = np.searchsorted(dict_np.astype(str), np.where(validity, str_np, dict_np[0] if len(dict_np) else ""))
            codes = codes.astype(np.int32)
            values = np.where(validity, codes, 0).astype(np.int32)
    elif f.dtype.kind is TypeKind.DECIMAL:
        # arrow decimal128 -> scaled int64: view the 128-bit mantissa
        # buffer directly (low limb; |v| < 2^63 guaranteed by p<=18)
        buf = arr.buffers()[1]
        limbs = np.frombuffer(buf, dtype=np.int64)
        values = np.ascontiguousarray(
            limbs.reshape(-1, 2)[arr.offset:arr.offset + n, 0])
    elif f.dtype.kind is TypeKind.DATE32:
        values = np.asarray(arr.cast(pa.int32()), dtype=np.int32)
        values = np.where(validity, values, 0)
    else:
        if arr.null_count:
            arr = arr.fill_null(False if pa.types.is_boolean(arr.type) else 0)
        values = np.asarray(arr).astype(_np_dtype_for(f.dtype))
    if f.dtype.kind in (TypeKind.INT32, TypeKind.INT64,
                        TypeKind.DATE32, TypeKind.DECIMAL) and n:
        vv = values[validity] if not validity.all() else values
        if len(vv):
            # value bounds let sort/join/group keys pack into shared
            # int64 limbs downstream (planning metadata)
            bounds = (int(vv.min()), int(vv.max()))
    return values, validity, dict_np, False, bounds


def from_arrow(table, capacity: int | None = None,
               dictionaries: dict | None = None) -> tuple[Batch, Schema]:
    """Convert a pyarrow Table to a device Batch + Schema (all columns;
    see TableProvider for per-column lazy ingest)."""
    n = table.num_rows
    cap = round_capacity(n if capacity is None else capacity)
    schema = schema_from_arrow(table.schema)
    cols = []
    dicts = {}
    int_bounds = {}
    unsorted = set()
    for i, f in enumerate(schema.fields):
        values, validity, dict_np, is_raw, bounds = ingest_column_host(
            table.column(i), f, n, dictionaries)
        if dict_np is not None:
            dicts[f.name] = dict_np
        if is_raw:
            unsorted.add(f.name)
        if bounds is not None:
            int_bounds[f.name] = bounds
        cols.append(make_column(values, validity, f.dtype, cap))
    schema = Schema(schema.fields, dicts, int_bounds, unsorted)
    return Batch(tuple(cols), jnp.int32(n)), schema


def to_numpy(batch: Batch, schema: Schema) -> dict:
    """Materialize live rows host-side: dict name -> (values ndarray, validity ndarray).

    Strings are decoded through the schema dictionary into object arrays;
    decimals stay scaled int64 (use `to_pandas` for Python Decimals).
    """
    n = int(batch.num_rows)
    out = {}
    for f, col in zip(schema.fields, batch.columns):
        data = np.asarray(col.data)[:n]
        valid = np.asarray(col.validity)[:n]
        if f.dtype.kind is TypeKind.STRING:
            d = schema.dictionary(f.name)
            if d is None:
                d = np.array([], dtype=object)
            decoded = np.empty(n, dtype=object)
            codes = np.clip(data, 0, max(len(d) - 1, 0))
            decoded[:] = d[codes] if len(d) else None
            decoded[~valid] = None
            out[f.name] = (decoded, valid)
        else:
            out[f.name] = (data, valid)
    return out


def to_pandas(batch: Batch, schema: Schema):
    """Live rows as a pandas DataFrame (decimals -> float for readability)."""
    import pandas as pd

    cols = {}
    raw = to_numpy(batch, schema)
    for f in schema.fields:
        data, valid = raw[f.name]
        if f.dtype.kind is TypeKind.DECIMAL:
            vals = data.astype(np.float64) / (10 ** f.dtype.scale)
            cols[f.name] = pd.Series(np.where(valid, vals, np.nan))
        elif f.dtype.kind is TypeKind.STRING:
            cols[f.name] = pd.Series(data, dtype=object)
        elif f.dtype.kind is TypeKind.DATE32:
            s = pd.Series(data.astype("datetime64[D]"))
            s[~valid] = pd.NaT
            cols[f.name] = s
        elif f.dtype.kind in (TypeKind.FLOAT32, TypeKind.FLOAT64):
            cols[f.name] = pd.Series(np.where(valid, data, np.nan))
        else:
            s = pd.Series(data)
            if not valid.all():
                s = s.astype("object")
                s[~valid] = None
            cols[f.name] = s
    return pd.DataFrame(cols)


def schema_to_arrow(schema: Schema):
    """Engine Schema -> pyarrow schema (Flight/IPC egress)."""
    import pyarrow as pa

    simple = {TypeKind.BOOL: pa.bool_(), TypeKind.INT32: pa.int32(),
              TypeKind.INT64: pa.int64(), TypeKind.FLOAT32: pa.float32(),
              TypeKind.FLOAT64: pa.float64(), TypeKind.DATE32: pa.date32(),
              TypeKind.STRING: pa.string()}
    fields = []
    for f in schema.fields:
        if f.dtype.kind is TypeKind.DECIMAL:
            t = pa.decimal128(max(f.dtype.precision, f.dtype.scale + 1, 1),
                              f.dtype.scale)
        else:
            t = simple[f.dtype.kind]
        fields.append(pa.field(f.name, t, f.nullable))
    return pa.schema(fields)


def to_arrow(batch: Batch, schema: Schema):
    """Live rows as an exact pyarrow Table (decimals stay decimal128 —
    unlike to_pandas' float rendering). The Flight data plane's egress
    format (reference: Arrow IPC streams over Flight, flight_service.rs)."""
    import decimal as pydec

    import pyarrow as pa

    arrow_schema = schema_to_arrow(schema)
    raw = to_numpy(batch, schema)
    arrays = []
    for f, af in zip(schema.fields, arrow_schema):
        data, valid = raw[f.name]
        mask = ~valid
        if f.dtype.kind is TypeKind.DECIMAL:
            s = f.dtype.scale
            vals = [None if not v else pydec.Decimal(int(x)).scaleb(-s)
                    for x, v in zip(data.tolist(), valid.tolist())]
            arrays.append(pa.array(vals, type=af.type))
        elif f.dtype.kind is TypeKind.STRING:
            arrays.append(pa.array(data, type=pa.string()))
        elif f.dtype.kind is TypeKind.DATE32:
            arrays.append(pa.array(data.astype(np.int32), type=pa.date32(),
                                   mask=mask))
        else:
            arrays.append(pa.array(data, type=af.type, mask=mask))
    return pa.Table.from_arrays(arrays, schema=arrow_schema)


def from_pandas(df, schema: Schema | None = None, capacity: int | None = None):
    import pyarrow as pa

    table = pa.Table.from_pandas(df, preserve_index=False)
    return from_arrow(table, capacity)
