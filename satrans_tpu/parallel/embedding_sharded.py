"""Explicit sharded-embedding lookup via shard_map collectives.

Two ways to read a row-sharded bank (``PartitionSpec('data', None)``):

1. leave the gather to XLA SPMD (what the Trainer does by default) - the
   partitioner emits its own collective pattern;
2. this module's explicit ``alltoall_lookup`` schedule, for when the
   collective traffic must be deliberate, bounded, and benchmarkable
   (SURVEY.md section 2.3).

``alltoall_lookup`` is the classic two-round embedding exchange (the
DLRM/TPU-embedding schedule):

* requester side: sort the local flat ids, combine duplicates (one request
  per distinct row), bucket the unique ids by owning device
  (row ``r`` is owned by device ``r // (R/n)``) into a static
  ``[n, C]`` request table;
* ``all_to_all`` the requests (int32 - cheap), each owner gathers its
  owned rows locally, ``all_to_all`` the values back;
* undo the bucketing permutation and re-expand duplicates.

Per-device ICI traffic is ``~2 * n*C*d`` floats with
``C = capacity_factor * ceil(N/n)`` - INDEPENDENT of the mesh size for a
fixed local batch, which is what makes it viable at pod scale.  The
round-1 schedule this replaces (all-gather ids + psum a full-global-batch
partial-embedding tensor) moved ``O(n * N * d)`` per device and was
strictly worse than the SPMD default beyond a few chips.

MAINTENANCE NOTE: ``bank_sharded.lazy_routed_update`` implements the same
owner-bucketing exchange for the UPDATE direction with a different
slotting derivation - the two must agree on ownership (``r // (R/n)``),
overflow conventions, and clip-row OOB semantics (see its module doc).

Static shapes force a fixed per-destination capacity ``C``; a batch whose
unique-id ownership is skewed beyond ``C`` overflows.  Overflowed requests
return zero rows and are COUNTED (second return value) so callers can
monitor; ``capacity_factor=None`` selects the exact worst case ``C = N``
(every distinct id owned by one device).  After duplicate-combining, real
CTR batches are far below 2x balance skew - the default is
``capacity_factor=2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _dedup_sorted(flat_ids):
    """Sort ids; mark the first occurrence of each run.

    Returns ``(order, sorted_ids, uniq_slot, is_first)`` where
    ``uniq_slot[j]`` is the index (into first-occurrence positions) of
    sorted position j's value - duplicates share their run's slot.
    """
    order = jnp.argsort(flat_ids)
    si = flat_ids[order]
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), si[1:] != si[:-1]])
    uniq_slot = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    return order, si, uniq_slot, is_first


def alltoall_lookup(bank, ids, mesh: Mesh, axis: str = "data",
                    capacity_factor: float | None = 2.0):
    """``bank[ids]`` where ``bank`` is row-sharded over ``axis`` and ``ids``
    is batch-sharded; returns ``(embeddings, overflow_count)`` with the
    batch sharding preserved.

    ``bank``: [R, d] (R divisible by mesh size), ``ids``: int32 [...].
    ``overflow_count`` is an int32 ``[n]`` vector (one entry per device):
    how many of that device's unique requested rows exceeded the per-owner
    capacity this step (their embeddings are zeros).  All-zero under
    ``capacity_factor=None``.

    OOB ids are CLIPPED to [0, R) up front - the invariant every gather
    path shares (jnp.take mode='clip', the row-DMA kernel's contract,
    bank_optimizer.sparse_bank_grads): out-of-vocab data reads the clip
    row.  Unclipped, an id >= R would silently read zeros (its request
    dropped) and a negative id would read device 0's first REQUESTED
    row's embedding (round-4 review).
    """
    n = mesh.shape[axis]
    rows_per = bank.shape[0] // n
    d = bank.shape[1]
    ids = jnp.clip(ids, 0, bank.shape[0] - 1)
    if ids.size == 0:  # every field lives in the side bank - nothing to do
        return (jnp.zeros((*ids.shape, d), bank.dtype),
                jnp.zeros((n,), jnp.int32))

    def kernel(bank_local, ids_local):
        flat = ids_local.reshape(-1)
        N = flat.shape[0]
        C = N if capacity_factor is None else min(
            N, int(capacity_factor * -(-N // n)))

        order, si, uniq_slot, is_first = _dedup_sorted(flat)
        owner = si // rows_per                       # sorted -> nondecreasing
        # unique requests only: duplicates of a run request once
        req_valid = is_first
        # position of each request within its owner's bucket: running count
        # of prior valid requests with the same owner (sorted ids => owners
        # are grouped, so a segmented cumsum over the sorted order works)
        v = req_valid.astype(jnp.int32)
        cum = jnp.cumsum(v)
        # index of first sorted position per owner bucket
        first_pos = jnp.searchsorted(owner, jnp.arange(n), side="left")
        # valid-request count before each owner's bucket begins
        cum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum])
        before = cum0[first_pos]                     # [n]
        slot_in_owner = cum - 1 - before[owner]      # per sorted position
        ok = req_valid & (slot_in_owner < C)
        overflow = jnp.sum(req_valid) - jnp.sum(ok)

        # request table [n, C]: local row index at the owner, -1 = empty
        req = jnp.full((n, C), -1, jnp.int32)
        tgt_o = jnp.where(ok, owner, n)              # drop invalid
        tgt_s = jnp.where(ok, slot_in_owner, 0)
        req = req.at[tgt_o, tgt_s].set(si % rows_per, mode="drop")

        # round 1: requests to owners -> [n, C] (row j = requester j's asks)
        asks = jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        # owner answers: gather owned rows (empty slots -> zeros)
        valid_ask = asks >= 0
        vals = jnp.where(valid_ask[..., None],
                         bank_local[jnp.where(valid_ask, asks, 0)], 0.0)
        # round 2: values back to requesters -> [n, C, d]
        got = jax.lax.all_to_all(vals, axis, split_axis=0, concat_axis=0,
                                 tiled=False)

        # un-bucket: sorted position -> its request's value
        per_sorted = jnp.where(
            ok[:, None], got[tgt_o.clip(0, n - 1), tgt_s], 0.0)
        # duplicates: every sorted position takes its run's first-occurrence
        # value.  first-occurrence positions, indexed by uniq_slot:
        first_idx = jnp.nonzero(is_first, size=N, fill_value=0)[0]
        rows_sorted = per_sorted[first_idx][uniq_slot]
        # undo the sort
        inv = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N))
        rows = rows_sorted[inv]
        return rows.reshape(*ids_local.shape, d), overflow[None]

    shmap = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis), P(axis)))
    emb, overflow = shmap(bank, ids.reshape(ids.shape[0], -1) if ids.ndim > 1
                          else ids)
    return emb.reshape(*ids.shape, d), overflow


def sharded_lookup(bank, ids, mesh: Mesh, axis: str = "data"):
    """Round-1 schedule, kept for comparison benchmarks: all-gather the ids,
    every device answers for its rows over the FULL global batch, psum the
    partials.  ``O(n * global_batch * d)`` ICI traffic and memory per device
    - use :func:`alltoall_lookup` instead at scale."""
    n = mesh.shape[axis]
    rows_per = bank.shape[0] // n

    def kernel(bank_local, ids_local):
        all_ids = jax.lax.all_gather(ids_local, axis, tiled=True)
        flat = all_ids.reshape(-1)
        k = jax.lax.axis_index(axis)
        local = flat - k * rows_per
        mine = (local >= 0) & (local < rows_per)
        safe = jnp.where(mine, local, 0)
        part = jnp.where(mine[:, None], bank_local[safe], 0.0)
        full = jax.lax.psum(part, axis)          # [B_total*, d]
        full = full.reshape(*all_ids.shape, bank.shape[1])
        b_local = ids_local.shape[0]
        return jax.lax.dynamic_slice_in_dim(full, k * b_local, b_local, 0)

    shmap = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis))
    return shmap(bank, ids)


def replicated_lookup(bank, ids):
    return bank[ids]
