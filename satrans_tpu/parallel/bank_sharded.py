"""Mesh-sharded lazy bank update: route touched rows to their owners.

Round 2's ``bank_update='lazy'`` (train/bank_optimizer.lazy_update - the
headline-throughput mode, a documented deviation from the reference's dense
full-table Adam, see PARITY.md) was single-chip only: its opt state
(mu/nu/last/count) had no sharding story and the update assumed the whole
bank was addressable locally.  This module makes the same semantics run
under a ``jax.sharding.Mesh`` with the bank row-sharded
``PartitionSpec('data', None)``:

* every device holds its batch shard's ``(physical row id, grad row)``
  pairs (the sparse bank cotangent from
  ``bank_optimizer.sparse_bank_grads``);
* duplicates are combined LOCALLY first (sort + segment-sum - CTR batches
  are duplicate-heavy, this is most of the traffic reduction);
* the surviving unique pairs are bucketed by OWNING device
  (row ``r`` is owned by device ``r // (R/n)`` - the same contiguous
  row-range ownership as parallel/embedding_sharded.alltoall_lookup) into a
  static ``[n, C]`` table and exchanged with ONE ``all_to_all`` of ids and
  one of gradient rows;
* each owner re-combines duplicates across senders, then runs the
  decayed-moment lazy Adam + decoupled weight decay and the row commit
  entirely SHARD-LOCALLY - per-shard ``mu/nu/last`` never leave their
  device, and the row scatter can use the Pallas row-DMA kernel
  (ops/pallas/scatter.py) on each shard.

MAINTENANCE NOTE: this module and ``embedding_sharded.alltoall_lookup``
both implement "bucket sorted entries by owner into a capacity-capped
[n, C] table and all_to_all it", with deliberately different slotting
derivations (cumsum-of-valid here vs searchsorted first_pos there) tuned
to their payloads.  They MUST agree on the ownership rule
(``r // (R/n)``), the drop/overflow conventions, and the clip-row OOB
semantics - change one, check the other (each has its own equality
tests, which is the real guard).

Semantics match single-device ``lazy_update`` exactly up to f32 summation
order (local-then-owner duplicate combine vs one global sort) - tested by
``tests/test_bank_optimizer.py::test_lazy_under_mesh_matches_single``.

Traffic: per device ``~2 * n*C*(W+1)`` words with
``C = capacity_factor * ceil(N_local/n)`` - independent of mesh size for a
fixed per-device batch, like the forward exchange.  ``capacity_factor=None``
selects the exact worst case ``C = N_local`` (every unique row owned by one
device).  A skewed batch that overflows a bucket DROPS those rows' gradient
for the step (their ``last`` is not advanced, so nothing decays
incorrectly - the rows are simply not touched); the overflow count is
returned so callers can monitor, and the default factor 2 makes it a
non-event for real CTR batches (see embedding_sharded module docs).

Reference context: the reference has no distributed optimizer at all (its
only parallelism is an unused single-process DataParallel branch,
basemodel.py:271-274); this is the TPU-native scale-out of the one axis
that matters for CTR models (embedding rows + their Adam state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..embeddings import combine_duplicate_rows
from ..train.bank_optimizer import (ADAM_B1, ADAM_B2, adam_rows,
                                    _scatter_impl, gather_rows_impl,
                                    pallas_scatter)


def lazy_routed_update(bank, mu, nu, last, count, flat_ids, g_rows, *,
                       lr: float, l2: float, mesh: Mesh, axis: str = "data",
                       capacity_factor: float | None = 2.0):
    """One lazy-Adam step on a row-sharded bank.

    ``bank/mu/nu``: [R, W] sharded ``P(axis, None)`` (R divisible by the
    mesh size - parallel.sharding.pad_banks guarantees it);
    ``last``: int32 [R] sharded ``P(axis)``; ``count``: replicated scalar;
    ``flat_ids``: int32 [N] and ``g_rows``: [N, W], batch-sharded
    ``P(axis)`` (N divisible by the mesh size - N = batch * fields and the
    batch axis is mesh-divisible).

    Returns ``(new_bank, new_mu, new_nu, new_last, new_count, overflow)``
    with the input shardings preserved; ``overflow`` is a replicated int32
    scalar (total dropped unique rows across devices this step, 0 under
    ``capacity_factor=None``).
    """
    n = mesh.shape[axis]
    R = bank.shape[0]
    rows_per = R // n
    assert R % n == 0, (R, n)
    N = flat_ids.shape[0]
    assert N % n == 0, \
        f"flat id count {N} not divisible by mesh size {n}"
    impl = _scatter_impl()

    def kernel(bank_l, mu_l, nu_l, last_l, count, ids_l, g_l):
        nl = ids_l.shape[0]
        C = nl if capacity_factor is None else min(
            nl, int(capacity_factor * -(-nl // n)))
        # OOB ids (out-of-vocab data) clip to the last row, mirroring the
        # forward gather and single-device lazy_update
        ids_l = jnp.clip(ids_l, 0, R - 1)

        # ---- local duplicate combine (sorted unique rows + summed grads)
        u, gu, valid = combine_duplicate_rows(ids_l, g_l)
        owner = jnp.where(valid, u // rows_per, n)     # nondecreasing
        first_pos = jnp.searchsorted(owner, jnp.arange(n), side="left")
        slot = jnp.arange(nl) - first_pos[jnp.minimum(owner, n - 1)]
        ok = valid & (slot < C)
        overflow = jnp.sum(valid) - jnp.sum(ok)

        # ---- bucket by owner into the static exchange tables
        tgt_o = jnp.where(ok, owner, n)                # drop -> row n
        tgt_s = jnp.where(ok, slot, 0)
        local_row = u - owner * rows_per               # owner-local index
        req_ids = jnp.full((n, C), -1, jnp.int32).at[tgt_o, tgt_s].set(
            local_row, mode="drop")
        req_g = jnp.zeros((n, C, g_l.shape[1]), g_l.dtype).at[
            tgt_o, tgt_s].set(gu, mode="drop")

        # ---- one exchange each way: ids (cheap) + grad rows
        asks = jax.lax.all_to_all(req_ids, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        gvals = jax.lax.all_to_all(req_g, axis, split_axis=0,
                                   concat_axis=0, tiled=False)

        # ---- owner side: combine duplicates ACROSS senders
        lids = asks.reshape(n * C)
        lids = jnp.where(lids >= 0, lids, rows_per)    # empty -> sentinel
        u2, gu2, valid2 = combine_duplicate_rows(
            lids, gvals.reshape(n * C, g_l.shape[1]))
        real = valid2 & (u2 >= 0) & (u2 < rows_per)
        u2s = jnp.where(real, u2, 0)
        tgt2 = jnp.where(real, u2, rows_per)           # sentinel drops

        # ---- shard-local lazy Adam (identical formulas to lazy_update);
        # the W-wide row reads ride the row-DMA gather kernel - safe here
        # because shard_map hands the kernel LOCAL arrays and local ids
        count_inc = count + 1
        k = (count_inc - 1 - jnp.take(last_l, u2s)).astype(jnp.float32)
        w_u0, m_u0, v_u0 = gather_rows_impl((bank_l, mu_l, nu_l), u2s)
        m_u = m_u0 * (ADAM_B1 ** k)[:, None]
        v_u = v_u0 * (ADAM_B2 ** k)[:, None]
        w_u = w_u0 * ((1.0 - 2.0 * l2 * lr) ** (k + 1.0))[:, None]
        w2, m2, v2 = adam_rows(w_u, m_u, v_u, gu2, count_inc, lr)

        # ---- shard-local commit
        if impl in ("pallas", "interpret"):
            nb, nm, nn_ = pallas_scatter().scatter_rows_set(
                (bank_l, mu_l, nu_l), tgt2, (w2, m2, v2),
                drop_oob=True, interpret=impl == "interpret")
        else:
            def over(arr, vals):
                return arr.at[tgt2].set(vals, mode="drop",
                                        indices_are_sorted=True,
                                        unique_indices=True)
            nb, nm, nn_ = over(bank_l, w2), over(mu_l, m2), over(nu_l, v2)
        nlast = last_l.at[tgt2].set(count_inc, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
        return (nb, nm, nn_, nlast, count_inc,
                jax.lax.psum(overflow, axis))

    shmap = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis),
                  P(), P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis),
                   P(), P()),
        check_vma=False)
    return shmap(bank, mu, nu, last, count, flat_ids, g_rows)
