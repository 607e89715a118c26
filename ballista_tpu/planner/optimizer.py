"""Logical optimizer rules.

Reference parity: DataFusion's optimizer (the engine kernel's
projection-pushdown / pruning rules that Ballista inherits). The one that
matters most on TPU is COLUMN PRUNING: scans otherwise carry every table
column through joins — at SF1 that is ~1 GB of lineitem columns resident
per stage for queries that read four of them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Set

from ..exprs import expr_columns
from . import logical as L


def prune_columns(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Push required-column sets down to TableScans (projection pushdown)."""
    return _prune(plan, None)


def _all_names(p: L.LogicalPlan) -> Set[str]:
    return {f.name for f in p.schema().fields}


def _prune(p: L.LogicalPlan, needed: Optional[Set[str]]) -> L.LogicalPlan:
    """needed=None means every output column is required."""
    if isinstance(p, L.TableScan):
        if needed is None:
            return p
        cols = [f.name for f in p.table_schema.fields if f.name in needed]
        if not cols:
            # count(*)-style: keep one column so the scan still carries rows
            cols = [p.table_schema.fields[0].name]
        if len(cols) == len(p.table_schema.fields):
            return p
        return dataclasses.replace(p, projection=tuple(cols))

    if isinstance(p, L.Projection):
        names = p.names or tuple(str(e) for e in p.exprs)
        if needed is None:
            keep = list(zip(p.exprs, names))
        else:
            keep = [(e, n) for e, n in zip(p.exprs, names) if n in needed]
            if not keep:  # keep at least one column (row counting)
                keep = [(p.exprs[0], names[0])]
        child_needed = set()
        for e, _ in keep:
            child_needed |= expr_columns(e)
        child = _prune(p.input, child_needed)
        return L.Projection(child, tuple(e for e, _ in keep),
                            tuple(n for _, n in keep))

    if isinstance(p, L.Filter):
        child_needed = (None if needed is None
                        else needed | expr_columns(p.predicate))
        return L.Filter(_prune(p.input, child_needed), p.predicate)

    if isinstance(p, L.Aggregate):
        child_needed = set()
        for g in p.group_exprs:
            child_needed |= expr_columns(g)
        for a in p.aggs:
            if a.arg is not None:
                child_needed |= expr_columns(a.arg)
            if a.arg2 is not None:
                child_needed |= expr_columns(a.arg2)
        return dataclasses.replace(p, input=_prune(p.input, child_needed))

    if isinstance(p, (L.Sort,)):
        child_needed = None
        if needed is not None:
            child_needed = set(needed)
            for e, _, _ in p.keys:
                child_needed |= expr_columns(e)
        return dataclasses.replace(p, input=_prune(p.input, child_needed))

    if isinstance(p, L.Limit):
        return dataclasses.replace(p, input=_prune(p.input, needed))

    if isinstance(p, L.Distinct):
        # distinct is over all columns of its input
        return dataclasses.replace(p, input=_prune(p.input, None))

    if isinstance(p, L.Join):
        lnames = _all_names(p.left)
        rnames = _all_names(p.right)
        if needed is None:
            lneed: Optional[Set[str]] = None
            rneed: Optional[Set[str]] = None
        else:
            lneed = {n for n in needed if n in lnames}
            rneed = {n for n in needed if n in rnames}
        for a, b in p.on:
            if lneed is not None:
                lneed.add(a)
            if rneed is not None:
                rneed.add(b)
        if p.how in ("semi", "anti"):
            # output is the probe (right) side only; build still needs keys
            lneed = {a for a, _ in p.on} if lneed is not None else None
        return dataclasses.replace(p, left=_prune(p.left, lneed),
                                   right=_prune(p.right, rneed))

    if isinstance(p, L.Union):
        # positional semantics: prune each input to its own projection
        # (inputs are Projections aligned by _plan_union / align helper)
        return dataclasses.replace(
            p, inputs=tuple(_prune(c, needed) for c in p.inputs))

    return p
