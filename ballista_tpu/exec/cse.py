"""Common-subplan elimination over physical operator trees.

Subquery decorrelation (EXISTS/IN → semi/anti joins) replans the outer
join chain once per subquery: TPC-H q21 carries THREE structurally
identical copies of the nation⋈supplier⋈orders⋈lineitem chain, each
costing multiple 6M-row sorts. XLA's HLO-level CSE does not reliably
unify them (each copy traces distinct sort/gather instances). This pass
dedups structurally identical subtrees into shared node objects and
memoizes each node's evaluate per trace, so a shared chain is traced and
executed exactly once.

Reference parity: DataFusion's logical CSE does not exist in the
reference either (Ballista inherits plan duplication); this is a
TPU-motivated improvement — duplicated subtrees multiply sort cost.
"""

from __future__ import annotations

from typing import Dict, Tuple

from .plan import ExecNode, InputLeaf

# params that distinguish otherwise same-labeled nodes
_KEY_ATTRS = ("input_id", "n", "mode", "table_size", "out_capacity",
              "join_type", "unique_build", "emit_sparse", "on", "P",
              "quota", "salt", "salt_mode", "key_names", "pre_filter",
              "_pre_exprs")


def _node_key(node: ExecNode, child_keys: Tuple) -> Tuple:
    extras = []
    for a in _KEY_ATTRS:
        if hasattr(node, a):
            extras.append((a, str(getattr(node, a))))
    # dictionary-valued state that can't be stringified structurally:
    # fall back to object identity (disables dedup for differing objects)
    if hasattr(node, "_luts"):
        extras.append(("_luts", tuple(sorted(
            (i, id(l)) for i, l in node._luts.items()))))
    schema = getattr(node, "schema", None)
    schema_key = (tuple((f.name, f.dtype.kind, f.nullable)
                        for f in schema.fields),
                  tuple(sorted((k, id(v))
                               for k, v in schema.dictionaries.items()))
                  ) if schema is not None else None
    return (type(node).__name__, node._label(),
            getattr(node, "capacity", None), schema_key,
            tuple(extras), child_keys)


def cse_tree(root: ExecNode) -> ExecNode:
    """Dedup structurally identical subtrees (bottom-up) and install
    per-trace evaluate memoization on every node. Idempotent."""
    pool: Dict[Tuple, ExecNode] = {}

    def rebuild(node: ExecNode) -> Tuple[ExecNode, Tuple]:
        child_results = [rebuild(c) for c in node.children]
        if child_results:
            node.children = tuple(n for n, _ in child_results)
        key = _node_key(node, tuple(k for _, k in child_results))
        if key in pool:
            return pool[key], key
        pool[key] = node
        _install_memo(node)
        return node, key

    new_root, _ = rebuild(root)
    return new_root


def _install_memo(node: ExecNode) -> None:
    if getattr(node, "_cse_memo_installed", False):
        return
    orig = node.evaluate

    def evaluate(inputs, _orig=orig, _node=node):
        memo = getattr(_node, "_cse_memo", None)
        if memo is not None and memo[0] is inputs:
            return memo[1]
        out = _orig(inputs)
        _node._cse_memo = (inputs, out)
        return out

    node.evaluate = evaluate
    node._cse_memo_installed = True
