"""Mesh + sharding layout for multi-chip training.

The reference's only distribution mechanism is an (unused)
``torch.nn.DataParallel`` branch (basemodel.py:271-274).  The TPU rebuild's
scalable axes (SURVEY.md section 2.3) are:

* **data parallelism** - the workhorse: batch dim sharded over every chip
  (``PartitionSpec('data')``); gradient all-reduce is inserted by XLA's SPMD
  partitioner over ICI (intra-slice) / DCN (cross-host).
* **embedding-table row sharding** - the one real model-parallel axis: the
  fused bank (``[total_rows, dim]``, up to ~6.4M rows x 32 for AliCCP) can be
  row-sharded ``PartitionSpec('data', None)``; lookups become a sharded
  gather that XLA lowers to collective exchanges.  Adam state shards with the
  rows for free (optax state mirrors the param tree).

TP/PP/SP are deliberately absent: the attention sequence length is the field
count (F ~ 19), so there is nothing to slice (SURVEY.md section 5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _put_global(arr, sharding: NamedSharding):
    """``device_put`` that also works across processes.

    Single-process: plain ``device_put``.  Multi-process (``jax.distributed``
    initialized): every process holds the SAME full value (params/opt/state
    are seeded identically on each host), so a global array is assembled by
    handing each process its addressable shards of that value - works for
    replicated and row-sharded specs alike.  Host-LOCAL batch shards go
    through :func:`shard_array`, which uses the process-local-data path
    instead.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _is_bank_path(path) -> bool:
    """True for fused embedding-bank leaves ('bank' key anywhere in the path)."""
    return any(getattr(k, "key", None) == "bank" for k in path)


def pad_banks(params, multiple: int):
    """Zero-pad every fused-bank leaf to a row multiple of the mesh size.

    Padded rows are never gathered (indices stay < total_rows) and contribute
    exactly zero to the full-table L2 (zero stays zero under l2-only
    gradients), so semantics are unchanged.
    """
    import jax.numpy as jnp

    def pad(path, leaf):
        if _is_bank_path(path) and np.ndim(leaf) == 2:
            rows = leaf.shape[0]
            target = -(-rows // multiple) * multiple
            if target != rows:
                return jnp.concatenate(
                    [leaf, jnp.zeros((target - rows, leaf.shape[1]),
                                     leaf.dtype)], axis=0)
        return leaf

    return jax.tree_util.tree_map_with_path(pad, params)


def params_sharding(model, params, mesh: Mesh, *, shard_embeddings: bool = False):
    """Sharding tree: banks row-sharded (optional), everything else replicated."""
    def spec_for(path, leaf):
        if shard_embeddings and _is_bank_path(path) and np.ndim(leaf) == 2 \
                and leaf.shape[0] >= mesh.devices.size:
            return NamedSharding(mesh, P("data", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place(model, params, opt_state, state, mesh: Mesh, *,
          shard_embeddings: bool = False):
    """Device-place params/opt_state/state with the layout above."""
    p_spec = params_sharding(model, params, mesh,
                             shard_embeddings=shard_embeddings)
    params = jax.tree.map(_put_global, params, p_spec)
    # optax state mirrors the param tree for Adam moments; shard matching
    # leaves the same way, scalars replicated.
    rep = NamedSharding(mesh, P())

    bank_shapes = {tuple(l.shape)
                   for pth, l in jax.tree_util.tree_leaves_with_path(params)
                   if _is_bank_path(pth)}
    bank_rows = {s[0] for s in bank_shapes}

    def place_opt(leaf):
        if hasattr(leaf, "shape") and shard_embeddings \
                and np.ndim(leaf) >= 1 \
                and leaf.shape[0] >= mesh.devices.size:
            # Heuristics: 2-D opt-state leaves of bank shape follow the bank
            # (Adam mu/nu); 1-D int leaves of bank ROW count are per-row
            # metadata (the lazy state's 'last' touch step) and row-shard
            # the same way.
            if np.ndim(leaf) == 2 and tuple(leaf.shape) in bank_shapes:
                return _put_global(leaf, NamedSharding(mesh, P("data", None)))
            if np.ndim(leaf) == 1 and leaf.shape[0] in bank_rows \
                    and np.issubdtype(leaf.dtype, np.integer):
                return _put_global(leaf, NamedSharding(mesh, P("data")))
        return _put_global(leaf, rep)

    opt_state = jax.tree.map(place_opt, opt_state)
    state = jax.tree.map(lambda l: _put_global(l, rep), state)
    return params, opt_state, state


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_array(arr, mesh: Mesh, *, axis: int = 0):
    """Shard ``axis`` (default leading) over 'data'.

    Multi-process: ``arr`` is this HOST'S shard (the ``ShardedBatchIterator``
    contract - host h holds global-batch rows h::H), and the returned global
    array's ``axis`` length is ``arr.shape[axis] * process_count``.
    """
    ndim = np.ndim(arr)
    spec = P(*([None] * axis), "data", *([None] * (ndim - axis - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr))


def shard_batch(batch: dict, mesh: Mesh, *, axis: int = 0) -> dict:
    return {k: shard_array(v, mesh, axis=axis) for k, v in batch.items()}
