"""Explicit sharded-embedding lookup via shard_map collectives.

Two ways to read a row-sharded bank (``PartitionSpec('data', None)``):

1. leave the gather to XLA SPMD (what the Trainer does by default) - the
   partitioner emits its own collective pattern;
2. this module's explicit schedule, for when you want the collective
   traffic to be deliberate and benchmarkable (BASELINE.md kernel-level
   goal): all-gather the ids (tiny), gather locally with an ownership mask,
   then psum the partial embeddings so every device holds the full batch.

Per-batch traffic for scheme 2: ids all-gather ``B*F*4`` bytes + one psum of
``[B*F, d]`` floats over ICI - ~20 MB for B=8192, F=19, d=32, well under a
v5e's ICI budget per step.  Rows are owned contiguously: device k holds rows
``[k*R/n, (k+1)*R/n)`` of the zero-padded bank (see sharding.pad_banks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_lookup(bank, ids, mesh: Mesh, axis: str = "data"):
    """``bank[ids]`` where ``bank`` is row-sharded over ``axis`` and ``ids``
    is batch-sharded.  Returns embeddings with the same batch sharding.

    ``bank``: [R, d] (R divisible by mesh size), ``ids``: int32 [...]
    """
    n = mesh.shape[axis]
    rows_per = bank.shape[0] // n

    def kernel(bank_local, ids_local):
        # every device needs every id to answer for its rows
        all_ids = jax.lax.all_gather(ids_local, axis, tiled=True)
        flat = all_ids.reshape(-1)
        k = jax.lax.axis_index(axis)
        local = flat - k * rows_per
        mine = (local >= 0) & (local < rows_per)
        safe = jnp.where(mine, local, 0)
        part = jnp.where(mine[:, None], bank_local[safe], 0.0)
        full = jax.lax.psum(part, axis)          # [B_total*, d]
        full = full.reshape(*all_ids.shape, bank.shape[1])
        # return this device's batch shard
        b_local = ids_local.shape[0]
        return jax.lax.dynamic_slice_in_dim(full, k * b_local, b_local, 0)

    shmap = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis))
    return shmap(bank, ids)


def replicated_lookup(bank, ids):
    return bank[ids]
