"""SQL AST -> LogicalPlan.

Reference parity: DataFusion's SQL planner + the subset of its optimizer
rules that matter for TPC-H shapes (predicate pushdown into scans,
equi-join extraction from WHERE conjuncts, EXISTS/IN decorrelation to
semi/anti joins, two-phase aggregate preparation).

Join build-side selection is uniqueness-driven: HashJoinExec requires
unique build keys (FK->PK), so we track which column sets are unique per
relation (registered PKs, group-by keys, Distinct outputs) and always put
the unique side on the build.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

from ..exprs import (Alias, Between, BinOp, Case, Cast, Col, Expr, InList,
                     IsNull, Like, Lit, Neg, Not, ScalarFn, expr_columns,
                     expr_name)
from ..exec.aggregate import AggExpr
from ..planner import logical as L
from .parser import (AggCall, ExistsExpr, InSubquery, JoinClause, SelectStmt,
                     Star, SubqueryExpr, TableRef, parse_sql)


# ---------------------------------------------------------------------------
# Scope: name resolution across the relations of one SELECT
# ---------------------------------------------------------------------------


class Relation:
    def __init__(self, rel_id: int, names: List[str], plan: L.LogicalPlan,
                 alias: Optional[str], unique_sets: List[frozenset]):
        self.rel_id = rel_id
        self.names = names          # original column names
        self.plan = plan
        self.alias = alias          # table alias (or table name)
        self.out_names = dict(zip(names, names))  # orig -> output name
        self.unique_sets = unique_sets

    def rename_for_collisions(self, collisions: Set[str]):
        if not any(n in collisions for n in self.names):
            return
        mapping = {}
        for n in self.names:
            if n in collisions:
                mapping[n] = f"{self.alias}.{n}" if self.alias else f"r{self.rel_id}.{n}"
        schema = self.plan.schema()
        new_names = [mapping.get(f.name, f.name) for f in schema.fields]
        self.plan = L.Projection(self.plan, tuple(Col(f.name) for f in schema.fields),
                                 tuple(new_names))
        self.out_names = {n: mapping.get(n, n) for n in self.names}
        self.unique_sets = [frozenset(mapping.get(c, c) for c in s)
                            for s in self.unique_sets]


class Scope:
    def __init__(self, relations: List[Relation], outer: Optional["Scope"] = None):
        self.relations = relations
        self.outer = outer

    def resolve(self, name: str) -> Optional[str]:
        """Resolve a (possibly qualified) column reference to an output name."""
        if "." in name:
            qual, col = name.split(".", 1)
            for r in self.relations:
                if r.alias == qual and col in r.out_names:
                    return r.out_names[col]
            return None
        hits = [r.out_names[name] for r in self.relations if name in r.out_names]
        if len(hits) == 1:
            return hits[0]
        if len(hits) > 1:
            raise ValueError(f"ambiguous column {name!r}")
        return None

    def resolve_or_outer(self, name: str):
        """Returns ('local', out_name) | ('outer', out_name) | (None, None)."""
        local = self.resolve(name)
        if local is not None:
            return "local", local
        if self.outer is not None:
            kind, out = self.outer.resolve_or_outer(name)
            if kind is not None:
                return "outer", out
        return None, None


def _rewrite_cols(e: Expr, mapping) -> Expr:
    """Rewrite Col names through `mapping: str -> str`（raising on misses)."""
    if isinstance(e, Col):
        return Col(mapping(e.name))
    if isinstance(e, Alias):
        return Alias(_rewrite_cols(e.child, mapping), e.name)
    changes = {}
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, Expr):
            changes[f.name] = _rewrite_cols(v, mapping)
        elif isinstance(v, tuple):
            new_items = []
            dirty = False
            for item in v:
                if isinstance(item, Expr):
                    new_items.append(_rewrite_cols(item, mapping))
                    dirty = True
                elif isinstance(item, tuple):
                    sub = tuple(_rewrite_cols(s, mapping) if isinstance(s, Expr) else s
                                for s in item)
                    new_items.append(sub)
                    dirty = True
                else:
                    new_items.append(item)
            if dirty:
                changes[f.name] = tuple(new_items)
    if changes:
        return dataclasses.replace(e, **changes)
    return e


def _split_conjuncts(e: Optional[Expr]) -> List[Expr]:
    if e is None:
        return []
    if isinstance(e, BinOp) and e.op == "and":
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    if isinstance(e, BinOp) and e.op == "or":
        # factor conjuncts common to every OR branch:
        #   (A and X) or (A and Y)  ->  A and (X or Y)
        # (TPC-H Q19 hides its join predicate this way)
        branches = _split_disjuncts(e)
        branch_conjs = [_split_conjuncts(b) for b in branches]
        common = [c for c in branch_conjs[0]
                  if all(c in bc for bc in branch_conjs[1:])]
        if common:
            residual = []
            for bc in branch_conjs:
                rest = [c for c in bc if c not in common]
                residual.append(_conjoin(rest) or Lit(True))
            out = list(common)
            disj = residual[0]
            for r in residual[1:]:
                disj = BinOp("or", disj, r)
            out.append(disj)
            return out
    return [e]


def _split_disjuncts(e: Expr) -> List[Expr]:
    if isinstance(e, BinOp) and e.op == "or":
        return _split_disjuncts(e.left) + _split_disjuncts(e.right)
    return [e]


def _conjoin(parts: List[Expr]) -> Optional[Expr]:
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = BinOp("and", out, p)
    return out


def _find_aggs(e: Expr, out: List[AggCall]):
    if isinstance(e, AggCall):
        if e not in out:
            out.append(e)
        return
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, Expr):
            _find_aggs(v, out)
        elif isinstance(v, tuple):
            for item in v:
                if isinstance(item, Expr):
                    _find_aggs(item, out)
                elif isinstance(item, tuple):
                    for s in item:
                        if isinstance(s, Expr):
                            _find_aggs(s, out)


def _replace_subtree(e: Expr, target: Expr, replacement: Expr) -> Expr:
    if e == target:
        return replacement
    changes = {}
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, Expr):
            changes[f.name] = _replace_subtree(v, target, replacement)
        elif isinstance(v, tuple):
            new_items = []
            for item in v:
                if isinstance(item, Expr):
                    new_items.append(_replace_subtree(item, target, replacement))
                elif isinstance(item, tuple):
                    new_items.append(tuple(
                        _replace_subtree(s, target, replacement) if isinstance(s, Expr) else s
                        for s in item))
                else:
                    new_items.append(item)
            changes[f.name] = tuple(new_items)
    if changes:
        return dataclasses.replace(e, **changes)
    return e


# ---------------------------------------------------------------------------
# Planner
# ---------------------------------------------------------------------------


class SqlPlanner:
    def __init__(self, ctx):
        self.ctx = ctx  # SessionContext: .tables, .table_unique_keys(name)

    # -- catalog helpers --
    def _scan(self, rel_id: int, ref: TableRef, outer: Optional[Scope]) -> Relation:
        if ref.subquery is not None:
            plan = self.plan_select(ref.subquery, outer)
            schema = plan.schema()
            names = [f.name for f in schema.fields]
            uniq = []
            if isinstance(plan, L.Projection) and isinstance(plan.input, L.Aggregate):
                gb = plan.input
                keys = [expr_name(e) for e in gb.group_exprs]
                if all(k in names for k in keys):
                    uniq = [frozenset(keys)]
            return Relation(rel_id, names, plan, ref.alias, uniq)
        tp = self.ctx.tables[ref.name]
        schema = tp.schema
        names = [f.name for f in schema.fields]
        uniq = [frozenset(k) for k in self.ctx.unique_keys(ref.name)]
        plan = L.TableScan(ref.name, schema)
        return Relation(rel_id, names, plan, ref.alias or ref.name, uniq)

    def plan_select(self, stmt: SelectStmt, outer: Optional[Scope] = None) -> L.LogicalPlan:
        # 1. relations
        relations: List[Relation] = []
        for i, ref in enumerate(stmt.from_tables):
            relations.append(self._scan(i, ref, outer))
        explicit_joins = list(stmt.joins)
        for j, jc in enumerate(explicit_joins):
            relations.append(self._scan(len(stmt.from_tables) + j, jc.table, outer))

        # collision renaming (self-joins: nation n1, nation n2)
        seen: Dict[str, int] = {}
        for r in relations:
            for n in r.names:
                seen[n] = seen.get(n, 0) + 1
        collisions = {n for n, c in seen.items() if c > 1}
        for r in relations:
            r.rename_for_collisions(collisions)

        scope = Scope(relations, outer)

        # 2. classify WHERE conjuncts
        conjuncts = _split_conjuncts(stmt.where)
        for jc in explicit_joins:
            conjuncts.extend(_split_conjuncts(jc.on))
        join_edges: List[Tuple[int, str, int, str]] = []   # (rel_a, col_a, rel_b, col_b)
        per_rel_filters: Dict[int, List[Expr]] = {r.rel_id: [] for r in relations}
        post_filters: List[Expr] = []
        semi_joins: List[Tuple[SelectStmt, bool, Optional[Expr]]] = []  # (sub, negated, in_lhs)

        def rel_of(col_out_name: str) -> Optional[int]:
            for r in relations:
                if col_out_name in r.out_names.values():
                    return r.rel_id
            return None

        def resolve_expr(e: Expr) -> Expr:
            return _rewrite_cols(e, self._resolver(scope))

        for c in conjuncts:
            if isinstance(c, ExistsExpr):
                semi_joins.append((c.query, c.negated, None))
                continue
            if isinstance(c, Not) and isinstance(c.child, ExistsExpr):
                semi_joins.append((c.child.query, not c.child.negated, None))
                continue
            if isinstance(c, InSubquery):
                semi_joins.append((c.query, c.negated, c.child))
                continue
            if isinstance(c, BinOp) and c.op == "=" and isinstance(c.left, Col) \
                    and isinstance(c.right, Col):
                ln = scope.resolve(c.left.name)
                rn = scope.resolve(c.right.name)
                if ln is not None and rn is not None:
                    ra, rb = rel_of(ln), rel_of(rn)
                    if ra is not None and rb is not None and ra != rb:
                        join_edges.append((ra, ln, rb, rn))
                        continue
            # single-relation filter?
            cols = expr_columns(c)
            resolved = []
            rels = set()
            ok = True
            for name in cols:
                rn = scope.resolve(name)
                if rn is None:
                    ok = False
                    break
                resolved.append(rn)
                rels.add(rel_of(rn))
            if ok and len(rels) == 1:
                per_rel_filters[next(iter(rels))].append(resolve_expr(c))
            else:
                post_filters.append(resolve_expr(c))

        # 3. apply pushed-down filters
        plans: Dict[int, L.LogicalPlan] = {}
        uniq_by_rel: Dict[int, List[frozenset]] = {}
        for r in relations:
            p = r.plan
            f = _conjoin(per_rel_filters[r.rel_id])
            if f is not None:
                p = L.Filter(p, f)
            plans[r.rel_id] = p
            uniq_by_rel[r.rel_id] = list(r.unique_sets)

        # 4. greedy join-graph assembly (build side = unique side)
        how_by_rel = {}
        for j, jc in enumerate(explicit_joins):
            how_by_rel[len(stmt.from_tables) + j] = jc.how
        joined_ids = {relations[0].rel_id} if relations else set()
        current = plans[relations[0].rel_id] if relations else None
        current_uniq = uniq_by_rel[relations[0].rel_id] if relations else []
        remaining = [r.rel_id for r in relations[1:]]

        def edges_between(done: Set[int], rid: int):
            out = []
            for (a, ca, b, cb) in join_edges:
                if a in done and b == rid:
                    out.append((ca, cb))
                elif b in done and a == rid:
                    out.append((cb, ca))
            return out

        while remaining:
            pick = None
            for rid in remaining:
                if edges_between(joined_ids, rid):
                    pick = rid
                    break
            if pick is None:
                # cartesian product not supported yet
                raise NotImplementedError(
                    f"no join path to relations {remaining} (cross join unsupported)")
            pairs = edges_between(joined_ids, pick)
            cur_cols = frozenset(p[0] for p in pairs)
            new_cols = frozenset(p[1] for p in pairs)
            how = how_by_rel.get(pick, "inner")
            new_plan = plans[pick]
            new_uniq = uniq_by_rel[pick]
            if how == "inner":
                if any(s <= new_cols for s in new_uniq):
                    # build on the new relation; current stays probe
                    current = L.Join(new_plan, current,
                                     tuple((b, a) for a, b in pairs), "inner")
                    # probe-side uniques survive (build unique -> no duplication)
                elif any(s <= cur_cols for s in current_uniq):
                    current = L.Join(current, new_plan,
                                     tuple(pairs), "inner")
                    current_uniq = list(new_uniq)
                else:
                    raise NotImplementedError(
                        f"join without a unique side: {pairs} "
                        "(expanding hash join not yet implemented)")
            elif how == "left":
                # left outer: preserve current (probe) rows, build on new side
                if not any(s <= new_cols for s in new_uniq):
                    raise NotImplementedError("left join with non-unique right side")
                current = L.Join(new_plan, current,
                                 tuple((b, a) for a, b in pairs), "left_outer")
            else:
                raise NotImplementedError(f"join type {how}")
            joined_ids.add(pick)
            remaining.remove(pick)

        if current is None:
            raise NotImplementedError("SELECT without FROM")

        # 5. EXISTS / IN subqueries -> semi/anti joins
        for sub_stmt, negated, in_lhs in semi_joins:
            current, current_uniq = self._plan_semi(
                stmt, sub_stmt, negated, in_lhs, scope, current, current_uniq)

        # 6. residual post-join filters
        pf = _conjoin(post_filters)
        if pf is not None:
            current = L.Filter(current, pf)

        # 7. projections & aggregation
        return self._plan_projection(stmt, scope, current)

    # -- helpers --

    def _resolver(self, scope: Scope):
        def f(name: str) -> str:
            out = scope.resolve(name)
            if out is None:
                raise KeyError(f"cannot resolve column {name!r}")
            return out
        return f

    def _plan_semi(self, stmt, sub_stmt: SelectStmt, negated: bool,
                   in_lhs: Optional[Expr], scope: Scope, current, current_uniq):
        """Decorrelate EXISTS / IN (subquery) into a semi/anti join.

        The subquery is planned in a child scope; equality conjuncts that
        reference an outer column become join keys (classic decorrelation
        of equi-correlated subqueries, covering TPC-H Q4/Q16/Q18/Q20/Q21/Q22
        shapes).
        """
        # plan subquery FROM + local filters, extracting correlated equalities
        sub_relations: List[Relation] = []
        for i, ref in enumerate(sub_stmt.from_tables):
            sub_relations.append(self._scan(i, ref, scope))
        for j, jc in enumerate(sub_stmt.joins):
            sub_relations.append(self._scan(len(sub_stmt.from_tables) + j, jc.table, scope))
        sub_scope = Scope(sub_relations, scope)

        conjuncts = _split_conjuncts(sub_stmt.where)
        for jc in sub_stmt.joins:
            conjuncts.extend(_split_conjuncts(jc.on))
        corr_pairs: List[Tuple[str, str]] = []  # (inner_out, outer_out)
        local_conjuncts: List[Expr] = []
        for c in conjuncts:
            if isinstance(c, BinOp) and c.op == "=" and isinstance(c.left, Col) \
                    and isinstance(c.right, Col):
                lk, lo = sub_scope.resolve_or_outer(c.left.name)
                rk, ro = sub_scope.resolve_or_outer(c.right.name)
                if lk == "local" and rk == "outer":
                    corr_pairs.append((lo, ro))
                    continue
                if lk == "outer" and rk == "local":
                    corr_pairs.append((ro, lo))
                    continue
            local_conjuncts.append(c)

        inner_stmt = dataclasses.replace(
            sub_stmt, where=_conjoin(local_conjuncts), from_tables=[], joins=[])
        # rebuild inner plan manually (relations already scanned)
        inner = self._assemble_simple(sub_relations, inner_stmt, sub_scope)

        # IN-subquery adds (output col of subquery == lhs expr) as a key
        if in_lhs is not None:
            sub_proj = sub_stmt.projections
            assert len(sub_proj) == 1, "IN subquery must have 1 output column"
            inner_schema = inner.schema()
            inner_col = inner_schema.fields[0].name
            lhs = _rewrite_cols(in_lhs, self._resolver(scope))
            if not isinstance(lhs, Col):
                raise NotImplementedError("IN (subquery) with non-column lhs")
            corr_pairs.append((inner_col, lhs.name))

        if not corr_pairs:
            raise NotImplementedError("uncorrelated EXISTS not supported yet")

        inner_keys = [p[0] for p in corr_pairs]
        outer_keys = [p[1] for p in corr_pairs]
        # distinct build keys (lineitem has many rows per orderkey)
        inner = L.Aggregate(L.Projection(inner, tuple(Col(k) for k in inner_keys)),
                            tuple(Col(k) for k in inner_keys), ())
        how = "anti" if negated else "semi"
        out = L.Join(inner, current, tuple(zip(inner_keys, outer_keys)), how)
        return out, current_uniq

    def _assemble_simple(self, relations: List[Relation], stmt: SelectStmt,
                         scope: Scope) -> L.LogicalPlan:
        """Join + filter assembly for a subquery whose projections we ignore
        (used by semi-join planning; single-relation common case)."""
        conjuncts = _split_conjuncts(stmt.where)
        if len(relations) == 1:
            p = relations[0].plan
            resolved = [_rewrite_cols(c, self._resolver(scope)) for c in conjuncts]
            f = _conjoin(resolved)
            return L.Filter(p, f) if f is not None else p
        # multi-relation subquery: recurse through the full planner
        sub = dataclasses.replace(stmt)
        raise NotImplementedError("multi-table EXISTS subquery")

    def _plan_projection(self, stmt: SelectStmt, scope: Scope,
                         current: L.LogicalPlan) -> L.LogicalPlan:
        resolver = self._resolver(scope)
        # expand * and resolve select items
        items: List[Tuple[Expr, str]] = []
        cur_schema = current.schema()
        for e, alias in stmt.projections:
            if isinstance(e, Star):
                for f in cur_schema.fields:
                    items.append((Col(f.name), f.name))
                continue
            re_ = _rewrite_cols(e, resolver)
            name = alias or expr_name(e)
            items.append((re_, name))

        # aggregate detection
        agg_calls: List[AggCall] = []
        for e, _ in items:
            _find_aggs(e, agg_calls)
        having = _rewrite_cols(stmt.having, resolver) if stmt.having is not None else None
        if having is not None:
            _find_aggs(having, agg_calls)

        group_exprs: List[Expr] = []
        for g in stmt.group_by:
            if isinstance(g, int):
                group_exprs.append(items[g - 1][0])
            else:
                # group-by may reference a select alias
                if isinstance(g, Col):
                    hit = next((it for it, nm in items if nm == g.name), None)
                    if hit is not None and scope.resolve(g.name) is None:
                        group_exprs.append(hit)
                        continue
                group_exprs.append(_rewrite_cols(g, resolver))

        if agg_calls or group_exprs:
            aggs: List[AggExpr] = []
            agg_names: Dict[AggCall, str] = {}
            for i, a in enumerate(agg_calls):
                nm = f"__agg{i}"
                agg_names[a] = nm
                aggs.append(AggExpr(a.kind, a.arg, alias=nm, distinct=a.distinct))
            grp_names = []
            for i, g in enumerate(group_exprs):
                grp_names.append(g.name if isinstance(g, Col) else f"__grp{i}")
            plan = L.Aggregate(current, tuple(group_exprs), tuple(aggs),
                               tuple(grp_names))
            # rewrite items over aggregate output
            def rew(e: Expr) -> Expr:
                for a, nm in agg_names.items():
                    e = _replace_subtree(e, a, Col(nm))
                for g, nm in zip(group_exprs, grp_names):
                    if not isinstance(g, Col):
                        e = _replace_subtree(e, g, Col(nm))
                return e
            items = [(rew(e), nm) for e, nm in items]
            if having is not None:
                plan = L.Filter(plan, rew(having))
            current = plan

        proj = L.Projection(current, tuple(e for e, _ in items),
                            tuple(nm for _, nm in items))
        out: L.LogicalPlan = proj
        if stmt.distinct:
            out = L.Distinct(out)

        # ORDER BY: positions, aliases, or expressions
        if stmt.order_by:
            keys = []
            out_names = [nm for _, nm in items]
            for key, asc, nf in stmt.order_by:
                if isinstance(key, int):
                    keys.append((Col(out_names[key - 1]), asc, nf))
                elif isinstance(key, Col) and key.name in out_names:
                    keys.append((key, asc, nf))
                else:
                    # expression over the projection output (or input cols)
                    try:
                        k = _rewrite_cols(key, lambda n: n if n in out_names else self._resolver(scope)(n))
                    except KeyError:
                        k = key
                    keys.append((k, asc, nf))
            out = L.Sort(out, tuple(keys))
        if stmt.limit is not None:
            out = L.Limit(out, stmt.limit)
        return out


def plan_sql(sql: str, ctx) -> L.LogicalPlan:
    stmt = parse_sql(sql)
    return SqlPlanner(ctx).plan_select(stmt)
