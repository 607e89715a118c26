"""dbgen-format interop: .tbl ingest and expected-answer diffing.

Reference parity: `tpch.rs convert-tpch` consumes dbgen's `.tbl`
('|'-delimited, trailing '|', no header; benchmarks/src/bin/tpch.rs:731)
and `--expected-results` diffs query output against `answers/q{n}.out`
files read as '|'-delimited CSV with header (tpch.rs:421-422,1027-1044).
This module makes the engine plug-compatible with both: point it at a
directory produced by the real dbgen + a captured reference answer set
and the diff is EXACT (decimals quantized to the answer's scale, no
float tolerance for fixed-point columns).

Offline note: dbgen itself cannot be reproduced here (its text grammar
requires dists.dss); `python -m ballista_tpu.datagen --format tbl` plus
`write_answers` produce the same file formats from the deterministic
datagen so the gate is exercised end-to-end in CI and accepts real dbgen
data unchanged.
"""

from __future__ import annotations

import os
from decimal import Decimal
from typing import Dict, Optional

import pyarrow as pa

from .tpch import TPCH_TABLES, generate_table

_SCHEMAS: Dict[str, pa.Schema] = {}


def tpch_schema(name: str) -> pa.Schema:
    """Exact Arrow schema of a TPC-H table (from a tiny generated
    instance, so .tbl ingest always matches the native datagen)."""
    if name not in _SCHEMAS:
        _SCHEMAS[name] = generate_table(name, 0.001).schema
    return _SCHEMAS[name]


def read_tbl(path: str, name: str) -> pa.Table:
    """Read a dbgen `.tbl` file into the TPC-H Arrow schema."""
    import pyarrow.csv as pacsv

    schema = tpch_schema(name)
    # trailing '|' parses as one empty extra column
    names = list(schema.names) + ["__trailer"]
    t = pacsv.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=names),
        parse_options=pacsv.ParseOptions(delimiter="|"),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}))
    return t.drop_columns(["__trailer"])


def register_tpch_tbl(ctx, directory: str):
    """Register every `<table>.tbl` found in `directory` (dbgen output
    dir) on the session, with exact TPC-H schemas."""
    found = []
    for name in TPCH_TABLES:
        path = os.path.join(directory, f"{name}.tbl")
        if os.path.exists(path):
            ctx.register_arrow(name, read_tbl(path, name))
            found.append(name)
    if not found:
        raise FileNotFoundError(f"no .tbl files in {directory}")
    return found


# -- answer files (tpch.rs --expected-results format) --

def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return f"{v:.2f}"   # TPC-H answer convention: 2 fixed decimals
    return str(v)


def write_answers(pdt: dict, out_dir: str, queries=None):
    """Run the pandas oracle over `pdt` (oracle.to_pd tables) and write
    `answers/q{n}.out` files in the reference's format ('|'-delimited,
    with header)."""
    from ..benchmarks.oracle import ORACLES

    ans = os.path.join(out_dir, "answers")
    os.makedirs(ans, exist_ok=True)
    for q in queries or range(1, 23):
        exp = ORACLES[q](pdt)
        path = os.path.join(ans, f"q{q}.out")
        with open(path, "w") as f:
            f.write("|".join(map(str, exp.columns)) + "\n")
            for row in exp.itertuples(index=False):
                f.write("|".join(_fmt(v) for v in row) + "\n")
    return ans


def _render_rows(got, header, rows):
    """Format the engine frame cell-by-cell against the answer's printed
    scales (column-constant: taken from the first non-empty answer cell)."""
    scales = []
    for ci in range(len(header)):
        s = 0
        for r in rows:
            if r[ci]:
                s = len(r[ci].split(".")[1]) if "." in r[ci] else 0
                break
        scales.append(s)
    out = []
    for ri in range(len(got)):
        row = []
        for ci in range(len(header)):
            g = got.iloc[ri, ci]
            if isinstance(g, float) or str(got.dtypes.iloc[ci]).startswith("float"):
                gs = f"{g:.{scales[ci]}f}"
                if gs == "-" + "0." + "0" * scales[ci]:  # negative zero
                    gs = gs[1:]
            elif isinstance(g, Decimal):
                gs = str(g.quantize(Decimal(1).scaleb(-scales[ci])))
            else:
                gs = "" if g is None else str(g)
            row.append(gs)
        out.append(row)
    return out


def diff_expected(got, expected_dir: str, q: int) -> Optional[str]:
    """EXACT diff of an engine result frame against answers/q{n}.out.

    Non-float columns compare as exact strings; Decimal columns are
    quantized to the answer's printed scale and must match EXACTLY (the
    north-star bit-identical check); true floats (avg columns) round to
    the answer's printed decimals before comparing. Position-wise first;
    if that fails, both sides are canonically re-sorted by every column
    and re-compared — ORDER BY keys that don't cover all output columns
    leave tie order engine-defined (e.g. q16's 4-of-5-column sort), and
    a correct answer set with different tie-breaking must not fail the
    gate. Returns None on match, else the first difference."""
    path = os.path.join(expected_dir, "answers", f"q{q}.out")
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    header = lines[0].split("|")
    rows = [l.split("|") for l in lines[1:] if l]
    if len(got.columns) != len(header):
        return f"column count {len(got.columns)} vs {len(header)}"
    if len(got) != len(rows):
        return f"row count {len(got)} vs {len(rows)}"
    grows = _render_rows(got, header, rows)
    if grows == rows:
        return None
    # tie-tolerant retry: canonical full-row sort on both sides
    if sorted(grows) == sorted(rows):
        return None
    gs, es = sorted(grows), sorted(rows)
    for ri in range(len(es)):
        for ci in range(len(header)):
            if gs[ri][ci] != es[ri][ci]:
                return (f"q{q} col {header[ci]} row {ri} (canonical): "
                        f"got {gs[ri][ci]!r} expected {es[ri][ci]!r}")
    return None
