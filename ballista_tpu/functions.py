"""Function registry — list/search the engine's SQL functions.

Reference parity: `ballista-cli`'s ListFunctions / SearchFunctions commands
(ballista-cli/src/command.rs:36) and the UDF plugin registry
(core/src/plugin/udf.rs). Built-ins are recorded here; UDFs registered at
runtime (exprs.register_udf) are merged in by list_functions().
"""

from __future__ import annotations

from typing import Dict, List, Optional


class FunctionInfo:
    __slots__ = ("name", "kind", "signature", "description")

    def __init__(self, name: str, kind: str, signature: str,
                 description: str):
        self.name = name
        self.kind = kind  # scalar | aggregate | window | udf
        self.signature = signature
        self.description = description

    def as_dict(self) -> Dict[str, str]:
        return {"name": self.name, "kind": self.kind,
                "signature": self.signature,
                "description": self.description}


_BUILTINS: List[FunctionInfo] = [
    # scalar (exprs._bind_scalar_fn)
    FunctionInfo("abs", "scalar", "abs(x)", "absolute value"),
    FunctionInfo("coalesce", "scalar", "coalesce(a, b, ...)",
                 "first non-NULL argument"),
    FunctionInfo("substring", "scalar", "substring(s, start, len)",
                 "substring of a dictionary-encoded string column"),
    FunctionInfo("upper", "scalar", "upper(s)", "uppercase (dict LUT)"),
    FunctionInfo("lower", "scalar", "lower(s)", "lowercase (dict LUT)"),
    FunctionInfo("trim", "scalar", "trim(s)", "strip whitespace"),
    FunctionInfo("ltrim", "scalar", "ltrim(s)", "strip left whitespace"),
    FunctionInfo("rtrim", "scalar", "rtrim(s)", "strip right whitespace"),
    FunctionInfo("reverse", "scalar", "reverse(s)", "reverse string"),
    FunctionInfo("replace", "scalar", "replace(s, from, to)",
                 "literal substring replacement"),
    FunctionInfo("length", "scalar", "length(s)", "character length"),
    FunctionInfo("char_length", "scalar", "char_length(s)",
                 "character length"),
    FunctionInfo("octet_length", "scalar", "octet_length(s)",
                 "UTF-8 byte length"),
    FunctionInfo("concat", "scalar", "concat(a, b, ...) / a || b",
                 "string concatenation (1-2 dict columns + literals)"),
    FunctionInfo("date_trunc", "scalar", "date_trunc('year'|'month', d)",
                 "truncate a date"),
    FunctionInfo("floor", "scalar", "floor(x)", "round down"),
    FunctionInfo("ceil", "scalar", "ceil(x)", "round up"),
    FunctionInfo("round", "scalar", "round(x)", "round half to even"),
    FunctionInfo("sqrt", "scalar", "sqrt(x)", "square root"),
    FunctionInfo("extract_year", "scalar", "extract(year from d)",
                 "year of a date column"),
    # aggregates (sql/parser.py aggregate table + exec/aggregate.py)
    FunctionInfo("count", "aggregate", "count(*) | count(x) | count(distinct x)",
                 "row / non-NULL / distinct count"),
    FunctionInfo("sum", "aggregate", "sum([distinct] x)", "sum"),
    FunctionInfo("avg", "aggregate", "avg([distinct] x)", "arithmetic mean"),
    FunctionInfo("min", "aggregate", "min(x)", "minimum"),
    FunctionInfo("max", "aggregate", "max(x)", "maximum"),
    FunctionInfo("stddev", "aggregate", "stddev[_samp|_pop](x)",
                 "standard deviation (sample/population)"),
    FunctionInfo("variance", "aggregate", "var[_samp|_pop](x)",
                 "variance (sample/population)"),
    FunctionInfo("median", "aggregate", "median(x)", "exact median"),
    FunctionInfo("corr", "aggregate", "corr(x, y)",
                 "Pearson correlation coefficient"),
    FunctionInfo("percentile_cont", "aggregate",
                 "percentile_cont(f) within group (order by x)",
                 "continuous percentile"),
    FunctionInfo("grouping", "aggregate", "grouping(col)",
                 "1 when col is aggregated in a GROUPING SETS superset row"),
    # window (exec/window.py RANKING/NAVIGATION + aggregates OVER)
    FunctionInfo("row_number", "window", "row_number() over (...)",
                 "1-based row number within the partition"),
    FunctionInfo("rank", "window", "rank() over (...)",
                 "rank with gaps"),
    FunctionInfo("dense_rank", "window", "dense_rank() over (...)",
                 "rank without gaps"),
    FunctionInfo("ntile", "window", "ntile(n) over (...)",
                 "n roughly-equal buckets"),
    FunctionInfo("percent_rank", "window", "percent_rank() over (...)",
                 "(rank-1)/(rows-1)"),
    FunctionInfo("cume_dist", "window", "cume_dist() over (...)",
                 "cumulative distribution"),
    FunctionInfo("lag", "window", "lag(x[, n]) over (...)",
                 "value n rows before"),
    FunctionInfo("lead", "window", "lead(x[, n]) over (...)",
                 "value n rows after"),
    FunctionInfo("first_value", "window", "first_value(x) over (...)",
                 "first value in frame"),
    FunctionInfo("last_value", "window", "last_value(x) over (...)",
                 "last value in frame"),
    FunctionInfo("nth_value", "window", "nth_value(x, k) over (...)",
                 "k-th value in frame"),
]


def list_functions(kind: Optional[str] = None) -> List[FunctionInfo]:
    """All functions, built-ins plus runtime-registered UDFs."""
    from . import exprs

    out = list(_BUILTINS)
    for name, (fn, out_dtype, _prop) in sorted(exprs._UDF_REGISTRY.items()):
        out.append(FunctionInfo(name, "udf", f"{name}(...) -> {out_dtype!r}",
                                (fn.__doc__ or "user-defined function")
                                .strip().splitlines()[0]))
    if kind is not None:
        out = [f for f in out if f.kind == kind]
    return out


def search_functions(pattern: str) -> List[FunctionInfo]:
    """Case-insensitive substring match over name and description."""
    pat = pattern.lower()
    return [f for f in list_functions()
            if pat in f.name.lower() or pat in f.description.lower()]
