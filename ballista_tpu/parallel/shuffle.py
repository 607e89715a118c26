"""Distributed hash-repartition shuffle as an in-program collective.

Reference parity: ShuffleWriterExec's hash path (BatchPartitioner + per-
partition IPC files, `shuffle_writer.rs:328-449`) plus ShuffleReaderExec's
fetch (`shuffle_reader.rs:226`) — the entire write-to-disk / Flight-fetch /
object-store-fallback machinery collapses into ONE `lax.all_to_all` over
the mesh's ICI links, fused into the surrounding stage XLA program
(SURVEY.md §2.5 "TPU-native equivalent").

Mechanics (per shard, inside shard_map):
  dest  = salted_hash(keys) % P           for live rows
  sort rows by dest (grouped runs), rank within run
  scatter into a (P * quota) send buffer; counts per dest
  all_to_all(send), all_to_all(counts)
  compact received runs -> output Batch, num_rows = sum(recv_counts)

`quota` bounds rows any one shard sends to any one destination; overflow
is detected and surfaced so the driver can retry with a bigger quota
(capacity-with-retry, SURVEY.md §7 hard parts; skew splitting is the
planned follow-up).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..batch import Batch, Column, row_mask
from ..ops.hash import hash_columns
from .mesh import PARTITION_AXIS

SHUFFLE_SEED = 0x7F4A7C15


def shuffle_dest(batch: Batch, key_indices: Sequence[int], n_parts: int,
                 salt: int = 1, salt_mode: str | None = None):
    """Destination partition per live row (dead rows -> n_parts).

    Skewed-key splitting (SURVEY.md §2.5 follow-up): with salt S > 1 a
    key's rows split across S destinations. 'spread' (probe side) assigns
    each row one sub-bucket by position; 'replicate' (build side) is
    handled by the caller expanding rows S-fold first and passing the
    replica id via `sub`. Both sides compute dest = (h*S + sub) mod P, so
    probe sub-bucket j meets build replica j exactly once.
    """
    live = row_mask(batch)
    keys = [batch.columns[i] for i in key_indices]
    h = hash_columns(tuple(k.data for k in keys),
                     tuple(k.validity for k in keys), seed=SHUFFLE_SEED)
    if salt > 1:
        assert salt_mode == "spread"
        sub = (jnp.arange(batch.capacity, dtype=jnp.uint32)
               % jnp.uint32(salt))
        h = h * jnp.uint32(salt) + sub
    dest = (h % jnp.uint32(n_parts)).astype(jnp.int32)
    return jnp.where(live, dest, n_parts), live


def _send_layout_packed(batch: Batch, key_indices: Sequence[int],
                        n_parts: int, quota: int,
                        salt: int = 1, salt_mode: str | None = None):
    """The device half of a shuffle write (ShuffleWriterExec hash path) on
    the PACKED representation: group rows by destination into a
    (P*quota)-slot send buffer of int64 limb operands (ops/vsort
    pack_columns). Keeping the limbs alive across the whole exchange
    (sort -> slot gather -> all_to_all -> receive compaction) moves ~4x
    fewer arrays per step than per-column data+validity movement.

    Returns (send_ops, unpack, slot_live, send_counts, overflow, counts):
    send-op rows [d*quota, d*quota+send_counts[d]) are the rows destined
    to partition d; slot_live masks the real slots. `counts` is the
    PRE-CLAMP per-destination row count — the shuffle-write stats that
    drive quota/salt selection on overflow retry (the reference's
    PartitionStats idea, serde/scheduler/mod.rs:33-100)."""
    from ..ops.vsort import pack_columns

    P = n_parts
    if salt > 1 and salt_mode == "replicate":
        keys = [batch.columns[i] for i in key_indices]
        h = hash_columns(tuple(k.data for k in keys),
                         tuple(k.validity for k in keys), seed=SHUFFLE_SEED)
        live0 = row_mask(batch)
        cap0 = batch.capacity
        packed0, unpack = pack_columns(batch.columns)
        # replicate on the packed limbs: one gather per limb instead of
        # data+validity gathers per column
        j = jnp.arange(cap0 * salt, dtype=jnp.int32)
        orig = j // salt
        sub = (j % salt).astype(jnp.uint32)
        packed = [jnp.take(op, orig) for op in packed0]
        h = jnp.take(h, orig)
        live = jnp.take(live0, orig)
        dest = ((h * jnp.uint32(salt) + sub) % jnp.uint32(P)).astype(jnp.int32)
        dest = jnp.where(live, dest, P)
        cap = cap0 * salt
    else:
        dest, live = shuffle_dest(batch, key_indices, P, salt, salt_mode)
        packed, unpack = pack_columns(batch.columns)
        cap = batch.capacity

    # group rows by destination: ONE single-key sort moves every packed
    # limb with the dest key (gathering via an argsort permutation is
    # 6-8x slower than sorting payloads alongside the key on TPU)
    sorted_ops = jax.lax.sort((dest,) + tuple(packed), num_keys=1,
                              is_stable=True)
    sorted_dest = sorted_ops[0]
    # per-dest counts without scatter: counts[d] = searchsorted diff over
    # the sorted destinations (scatter costs ~0.5s/6M rows on v5e)
    dests = jnp.arange(P + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_dest, dests, side="left").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    offsets = starts[:P]
    overflow = jnp.any(counts > quota)
    send_counts = jnp.minimum(counts, quota)

    # gather rows into the (P*quota) send buffer: slot (d, k) reads the
    # k-th row destined to d (rows are contiguous after the sort)
    j = jnp.arange(P * quota, dtype=jnp.int32)
    d_of = j // quota
    k_of = j % quota
    src = jnp.take(offsets, d_of) + k_of
    slot_live = k_of < jnp.take(send_counts, d_of)
    src = jnp.clip(src, 0, cap - 1)
    send_ops = tuple(jnp.take(op, src) for op in sorted_ops[1:])
    return send_ops, unpack, slot_live, send_counts, overflow, counts


def exchange_send_layout(batch: Batch, key_indices: Sequence[int],
                         n_parts: int, quota: int,
                         salt: int = 1, salt_mode: str | None = None):
    """Batch-level send layout (the serial out-of-core runtime's host-side
    exchange): unpacks the packed layout once. The mesh runtime keeps the
    packed form through the collectives (hash_partition_exchange)."""
    send_ops, unpack, slot_live, send_counts, overflow, counts = \
        _send_layout_packed(batch, key_indices, n_parts, quota, salt,
                            salt_mode)
    cols = tuple(Column(c.data, c.validity & slot_live)
                 for c in unpack(send_ops))
    total = jnp.sum(send_counts).astype(jnp.int32)
    return Batch(cols, total), send_counts, overflow, counts


def hash_partition_exchange(batch: Batch, key_indices: Sequence[int],
                            n_parts: int, quota: int,
                            axis_name: str = PARTITION_AXIS,
                            salt: int = 1, salt_mode: str | None = None):
    """Inside shard_map: repartition rows by key hash across the mesh.

    Returns (out_batch, overflow) where out_batch has capacity
    n_parts*quota and overflow is a per-shard bool (quota exceeded; rows
    dropped — caller must retry with a larger quota).
    """
    P = n_parts
    send_ops, unpack, _slot_live, send_counts, overflow, counts = \
        _send_layout_packed(batch, key_indices, P, quota, salt, salt_mode)

    # the collectives ride the packed limbs: one all_to_all per int64
    # operand instead of one per column data + one per validity
    recv_counts = jax.lax.all_to_all(
        send_counts, axis_name, split_axis=0, concat_axis=0, tiled=True)
    recv_ops = tuple(jax.lax.all_to_all(op, axis_name, 0, 0, tiled=True)
                     for op in send_ops)

    # compact received runs (row j of sender-chunk k is live iff
    # j % quota < recv_counts[k]) with ONE packed single-key sort; unpack
    # once at the very end
    j = jnp.arange(P * quota, dtype=jnp.int32)
    keep = (j % quota) < jnp.take(recv_counts, j // quota)
    total = jnp.sum(keep).astype(jnp.int32)
    sorted_ops = jax.lax.sort(((~keep).astype(jnp.int32),) + recv_ops,
                              num_keys=1, is_stable=True)
    live = jnp.arange(P * quota, dtype=jnp.int32) < total
    cols = tuple(Column(c.data, c.validity & live)
                 for c in unpack(sorted_ops[1:]))
    return Batch(cols, total), overflow, counts


def all_gather_batch(batch: Batch, n_parts: int,
                     axis_name: str = PARTITION_AXIS) -> Batch:
    """Inside shard_map: gather every shard's rows onto every shard
    (Ballista CoalescePartitionsExec analog for the final merge stage).
    Output capacity = n_parts * capacity. Rides the packed limbs: one
    all_gather per int64 operand, one packed compaction sort, one unpack."""
    from ..ops.vsort import pack_columns

    cap = batch.capacity
    nrows = jax.lax.all_gather(batch.num_rows, axis_name)  # (P,)
    packed, unpack = pack_columns(batch.columns)
    gathered = tuple(jax.lax.all_gather(op, axis_name, tiled=True)
                     for op in packed)
    j = jnp.arange(n_parts * cap, dtype=jnp.int32)
    keep = (j % cap) < jnp.take(nrows, j // cap)
    total = jnp.sum(nrows).astype(jnp.int32)
    sorted_ops = jax.lax.sort(((~keep).astype(jnp.int32),) + gathered,
                              num_keys=1, is_stable=True)
    live = j < total
    cols = tuple(Column(c.data, c.validity & live)
                 for c in unpack(sorted_ops[1:]))
    return Batch(cols, total)
