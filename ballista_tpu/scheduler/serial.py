"""Serial (out-of-core) runtime: one partition at a time on ONE device,
shuffle data exchanged through host memory.

Reference parity: this is Ballista's actual executor model — a task runs
one stage x partition-group at a time and shuffle data is materialized
off-device between stages (`ShuffleWriterExec::execute_shuffle_write`,
shuffle_writer.rs:234 writes per-destination files; ShuffleReaderExec
fetches them). The mesh runtime folds the exchange into in-program
all_to_all collectives; this runtime runs the SAME stage programs
per-partition with each ExchangeExec's send buffer fetched to host RAM,
so the device working set is one partition of one stage — datasets larger
than HBM run by choosing n_partitions so each shard fits.

Each stage compiles ONCE (the per-partition program is identical; the
partition id rides as a scalar argument through _PartitionCtx).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import Batch, Column
from ..exec.distributed import (ExchangeExec, GatherExec, _PartitionCtx,
                                _TraceCtx)
from ..parallel.shuffle import exchange_send_layout
from .distributed_planner import (DistOptions, DistributedPlan,
                                  DistributedPlanner, Stage)
from .runtime import ShuffleOverflowError, StageMetrics

log = logging.getLogger("ballista_tpu.serial")


class _HostShard:
    """One partition's stage output on host: per-column (data, validity)
    numpy arrays + live row count (live rows are the prefix)."""

    def __init__(self, datas, valids, num_rows: int):
        self.datas = datas
        self.valids = valids
        self.num_rows = int(num_rows)


class _StageOutput:
    kind: str                      # 'exchange' | 'gather' | 'plain'

    def __init__(self, kind: str, n_parts: int, quota: int = 0):
        self.kind = kind
        self.n_parts = n_parts
        self.quota = quota
        self.shards: Dict[int, _HostShard] = {}
        self.send_counts: Dict[int, np.ndarray] = {}   # sender -> (P,)


def _fetch_shard(batch: Batch) -> _HostShard:
    """Device -> host, whole-capacity planes (exchange buffers are sliced
    per destination later; plain/gather outputs are prefix-sliced)."""
    datas = [np.asarray(c.data) for c in batch.columns]
    valids = [np.asarray(c.validity) for c in batch.columns]
    return _HostShard(datas, valids, int(batch.num_rows))


class SerialRuntime:
    def __init__(self, ctx, options: DistOptions, device=None):
        self.ctx = ctx
        self.opts = options
        self.device = device or jax.devices()[0]
        self.metrics: Dict[int, StageMetrics] = {}
        self._table_dicts: Dict[str, object] = {}

    # -- table partition ingest (one shard at a time, host-side) --

    def _table_shard(self, name: str, columns, pid: int, cap: int) -> Batch:
        from ..batch import compute_dictionaries, from_arrow
        tp = self.ctx.tables[name]
        key = (name, tuple(columns) if columns else None)
        P = self.opts.n_partitions
        n = tp.num_rows
        per = -(-n // P)
        if hasattr(tp, "range_table"):
            # out-of-core scan plane (ParquetDatasetProvider): read ONLY
            # this partition's row range from the part files — host RAM
            # holds one shard of one table, not the table
            if key not in self._table_dicts:
                self._table_dicts[key] = tp.dataset_dictionaries(columns)
            chunk = tp.range_table(pid * per, min((pid + 1) * per, n),
                                   columns)
        else:
            table = tp.arrow_table
            if columns:
                table = table.select(list(columns))
            if key not in self._table_dicts:
                self._table_dicts[key] = compute_dictionaries(table)
            chunk = table.slice(pid * per, per)
        b, _ = from_arrow(chunk, capacity=cap,
                          dictionaries=self._table_dicts[key])
        return b

    # -- host-side exchange assembly (the ShuffleReaderExec analog) --

    def _exchange_input(self, out: _StageOutput, pid: int, cap: int) -> Batch:
        """Partition pid's rows: slice [pid*q, pid*q+counts[k][pid]) from
        every sender k's send buffer, concatenated."""
        q = out.quota
        ref = out.shards[min(out.shards)]
        ncols = len(ref.datas)
        datas: List[List[np.ndarray]] = [[] for _ in range(ncols)]
        valids: List[List[np.ndarray]] = [[] for _ in range(ncols)]
        total = 0
        for k in sorted(out.shards):
            sh = out.shards[k]
            cnt = int(out.send_counts[k][pid])
            if cnt == 0:
                continue
            lo = pid * q
            for i in range(ncols):
                datas[i].append(sh.datas[i][lo:lo + cnt])
                valids[i].append(sh.valids[i][lo:lo + cnt])
            total += cnt
        return self._assemble(datas, valids, total, cap,
                              [d.dtype for d in ref.datas])

    def _gather_input(self, out: _StageOutput, cap: int) -> Batch:
        ref = out.shards[min(out.shards)]
        ncols = len(ref.datas)
        datas: List[List[np.ndarray]] = [[] for _ in range(ncols)]
        valids: List[List[np.ndarray]] = [[] for _ in range(ncols)]
        total = 0
        for k in sorted(out.shards):
            sh = out.shards[k]
            if sh.num_rows == 0:
                continue
            for i in range(ncols):
                datas[i].append(sh.datas[i][:sh.num_rows])
                valids[i].append(sh.valids[i][:sh.num_rows])
            total += sh.num_rows
        return self._assemble(datas, valids, total, cap,
                              [d.dtype for d in ref.datas])

    def _assemble(self, datas, valids, total: int, cap: int, dtypes) -> Batch:
        assert total <= cap, f"assembled {total} rows > capacity {cap}"
        cols = []
        for parts_d, parts_v, dt in zip(datas, valids, dtypes):
            if parts_d:
                d = np.concatenate(parts_d)
                v = np.concatenate(parts_v)
            else:
                d = np.zeros(0, dt)
                v = np.zeros(0, bool)
            pad = cap - len(d)
            d = np.concatenate([d, np.zeros(pad, d.dtype)])
            v = np.concatenate([v, np.zeros(pad, bool)])
            cols.append(Column(jax.device_put(d, self.device),
                               jax.device_put(v, self.device)))
        return Batch(tuple(cols), jnp.int32(total))

    # -- stage compilation --

    def _compile_stage(self, stage: Stage):
        root = stage.root
        if isinstance(root, ExchangeExec):
            kind, body = "exchange", root.children[0]
        elif isinstance(root, GatherExec):
            kind, body = "gather", root.children[0]
        else:
            kind, body = "plain", root
        leaf_ids = sorted({l.input_id for l in root.leaves()})
        op_labels: List[str] = []

        def run(pid, inputs):
            with _TraceCtx() as tc, _PartitionCtx(pid):
                out = body.evaluate(inputs)
                counts = jnp.zeros(self.opts.n_partitions, jnp.int32)
                raw = jnp.zeros(self.opts.n_partitions, jnp.int32)
                if kind == "exchange":
                    out, counts, ovf, raw = exchange_send_layout(
                        out, root._key_idx, root.n_parts, root.quota,
                        root.salt, root.salt_mode)
                    _TraceCtx.record_overflow(ovf)
                overflow = jnp.bool_(False)
                for f in tc.overflow:
                    overflow = overflow | f
                op_labels.clear()
                op_labels.extend(l for l, _ in tc.op_rows)
                rows = (jnp.stack([jnp.asarray(r, jnp.int32)
                                   for _, r in tc.op_rows])
                        if tc.op_rows else jnp.zeros(0, jnp.int32))
            return out, counts, overflow, rows, raw

        return jax.jit(run), leaf_ids, op_labels, kind

    # -- execution --

    def execute(self, dplan: DistributedPlan):
        P = self.opts.n_partitions
        outputs: Dict[str, _StageOutput] = {}
        self.metrics = {}
        for stage in dplan.stages:
            m = StageMetrics()
            self.metrics[stage.stage_id] = m
            t0 = time.time()
            fn, leaf_ids, op_labels, kind = self._compile_stage(stage)
            leaf_caps = {l.input_id: (l.capacity, len(l.schema.fields))
                         for l in stage.root.leaves()}
            quota = stage.root.quota if kind == "exchange" else 0
            sout = _StageOutput(kind, P, quota)

            # a stage whose root prunes to shard 0 only produces rows for
            # pid 0 — when every input is partition-replicated (gathered),
            # the other partitions are provably empty and skipped
            pids = range(P)
            if self._prunes_to_shard0(stage) and all(
                    self._replicated(stage, outputs, lid)
                    for lid in leaf_ids):
                pids = [0]

            op_totals: Dict[str, int] = {}
            for pid in pids:
                inputs = {}
                for lid in leaf_ids:
                    cap, _ = leaf_caps[lid]
                    src = stage.sources[lid]
                    if src.kind == "table":
                        inputs[lid] = self._table_shard(
                            src.name, getattr(src, "columns", None), pid, cap)
                    else:
                        prod = outputs[src.name]
                        if prod.kind == "exchange":
                            inputs[lid] = self._exchange_input(prod, pid, cap)
                        else:
                            inputs[lid] = self._gather_input(prod, cap)
                out, counts, overflow, rows, raw = fn(jnp.int32(pid), inputs)
                if bool(np.asarray(overflow)):
                    err = ShuffleOverflowError(
                        f"stage {stage.stage_id} partition {pid}: shuffle "
                        "quota exceeded (retry with larger quota_headroom)")
                    if kind == "exchange":
                        # shuffle-write stats from the overflowing shard
                        # (PartitionStats, serde/scheduler/mod.rs:33-100)
                        err.stats = [{
                            "quota": quota,
                            "salt_kind": getattr(stage.root, "salt_kind",
                                                 None),
                            "counts": np.asarray(raw)[None, :]}]
                    raise err
                sout.shards[pid] = _fetch_shard(out)
                if kind == "exchange":
                    sout.send_counts[pid] = np.asarray(counts)
                for lbl, v in zip(op_labels, np.asarray(rows)):
                    op_totals[lbl] = op_totals.get(lbl, 0) + int(v)
            m.operator_rows = op_totals
            m.run_s = time.time() - t0
            m.output_rows = sum(sh.num_rows for sh in sout.shards.values())
            outputs[str(stage.stage_id)] = sout
            log.debug("serial stage %d done: %s", stage.stage_id,
                      m.as_dict())

        final = outputs[str(dplan.final_stage)]
        schema = dplan.final_schema
        from ..batch import round_capacity
        total = sum(sh.num_rows for sh in final.shards.values())
        out_batch = self._gather_input(final, round_capacity(max(total, 1)))
        return out_batch, schema

    def _prunes_to_shard0(self, stage: Stage) -> bool:
        from ..exec.distributed import PartitionPruneExec
        node = stage.root
        while True:
            if isinstance(node, PartitionPruneExec):
                return True
            if len(node.children) != 1:
                return False
            node = node.children[0]

    def _replicated(self, stage: Stage, outputs, lid: str) -> bool:
        src = stage.sources[lid]
        return src.kind == "stage" and outputs[src.name].kind == "gather"


def execute_serial(ctx, plan, n_partitions: int,
                   options: Optional[DistOptions] = None,
                   max_retries: int = 4, device=None):
    """Plan + run out-of-core with the same quota-overflow/skew retry
    escalation as the mesh path (runtime.py execute_distributed)."""
    import dataclasses as dc

    from ..client.context import _rebind_scans
    from ..planner.optimizer import prune_columns, reduce_group_keys

    plan = _rebind_scans(plan, ctx)
    plan = prune_columns(reduce_group_keys(plan))
    opts = options or ctx_dist_options(ctx, n_partitions)
    opts = dc.replace(opts, n_partitions=n_partitions)
    for attempt in range(max_retries):
        planner = DistributedPlanner(ctx, opts)
        dplan = planner.plan(plan)
        rt = SerialRuntime(ctx, opts, device=device)
        try:
            return rt.execute(dplan)
        except ShuffleOverflowError as e:
            if attempt == max_retries - 1:
                raise
            from .runtime import escalate_overflow_opts
            opts = escalate_overflow_opts(opts, e, attempt)
            log.warning("serial shuffle overflow; retrying with headroom "
                        "%.1f, join salt %d", opts.quota_headroom,
                        opts.join_salt)


def ctx_dist_options(ctx, n_partitions: int) -> DistOptions:
    cfg = getattr(ctx, "config", None)
    if cfg is not None:
        return cfg.to_dist_options(n_partitions)
    return DistOptions(n_partitions=n_partitions)
