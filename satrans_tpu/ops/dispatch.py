"""Domain-sorted tile dispatch for per-domain weight kernels.

The masked wide-GEMM trick (ops/pallas/meta_block._meta_apply) computes
every example against EVERY domain's weights - cost linear in the domain
count D.  Fine for a handful of scenario ids (the single-column case,
D+1 = 4 on AliCCP), pathological for composite product-domain tables
(reference satrans.py:205-207 multi-column: prod(D_i+1) combos, e.g. 56
for 301 x 122): measured 72 ms/step vs the 25 ms single-column fused step
(bench/variant_matrix.py round 5).

This module removes the D-dependence with an MoE-style capacity dispatch:

1. sort examples by composite domain id,
2. pad each domain's run to a multiple of the kernel tile ``TB`` so every
   tile holds rows of EXACTLY ONE domain (slack rows are zeros whose
   outputs are never gathered back - their cotangents are exactly zero),
3. the kernel then reads one small per-tile weight block (gathered
   outside the kernel, so XLA's autodiff of the gather routes the
   per-tile gradients back to the [D, P] table via scatter-add) instead
   of the [d, D*h] wide operands - per-tile GEMMs are the same
   ``[TB*F, d] @ [d, h]`` shape as the single-column kernel's.

Worst-case slack is ``D * (TB - 1)`` rows (~22% at B=8192, D=56, TB=32);
all shapes are static under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DispatchPlan:
    """Static-shape dispatch of ``B`` examples into single-domain tiles.

    Both directions are SINGLE gathers (int index vectors precomputed
    from the sort): scattering real rows into the padded buffer and then
    gathering them back would cost an extra scatter pass each way."""
    src: jax.Array        # [n_slots] source example per slot (-1 = slack)
    back: jax.Array       # [B] slot holding example b's output
    tile_dom: jax.Array   # [n_slots // tile] domain id served by each tile
    n_slots: int          # padded buffer rows (static: B + D*tile)
    tile: int


def plan(domain_ids, num_domains: int, tile: int) -> DispatchPlan:
    """Build the dispatch for ``domain_ids`` in ``[0, num_domains)``.

    ``n_slots`` is the static worst case ``B + num_domains * tile``
    (every domain padding up to one partial tile); actual occupancy is
    tracked by ``dest`` and the slack slots stay zero.
    """
    B = domain_ids.shape[0]
    if B % tile:
        raise ValueError(f"batch {B} must divide tile {tile}")
    cid = domain_ids.astype(jnp.int32)
    counts = jnp.bincount(cid, length=num_domains)            # [D]
    padded = ((counts + tile - 1) // tile) * tile
    ends = jnp.cumsum(padded)                                 # [D]
    offs = ends - padded
    starts = jnp.cumsum(counts) - counts
    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    sorted_cid = cid[order]
    rank = jnp.arange(B, dtype=jnp.int32) - starts[sorted_cid]
    dest = (offs[sorted_cid] + rank).astype(jnp.int32)        # [B]
    n_slots = B + num_domains * tile                          # static bound
    # invert the placement into per-slot source indices (small int
    # scatters; the big [.., F, d] moves below are then pure gathers)
    src = jnp.full((n_slots,), -1, jnp.int32).at[dest].set(order)
    back = jnp.zeros((B,), jnp.int32).at[order].set(dest)
    slot = jnp.arange(0, n_slots, tile, dtype=jnp.int32)
    # tile t serves the domain whose padded run covers its first slot;
    # tiles past the last occupied slot are slack - clamp them to the last
    # domain (their rows are zero and their outputs never read)
    tile_dom = jnp.minimum(jnp.searchsorted(ends, slot, side="right"),
                           num_domains - 1).astype(jnp.int32)
    return DispatchPlan(src=src, back=back, tile_dom=tile_dom,
                        n_slots=n_slots, tile=tile)


def scatter(x, p: DispatchPlan):
    """[B, ...] -> padded [n_slots, ...] single-domain-per-tile buffer
    (one gather; slack slots read row 0 and are zeroed by the mask)."""
    valid = (p.src >= 0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(valid, x[jnp.maximum(p.src, 0)], 0).astype(x.dtype)


def gather_back(buf, p: DispatchPlan):
    """Inverse of :func:`scatter`: padded buffer -> original order
    (one gather by the precomputed slot indices; length is ``B``).

    SATrans itself gathers only the scalar prediction back
    (``pred[p.back]``, models/satrans.py) - this full-tensor inverse is
    for callers that need the per-field output in batch order."""
    return buf[p.back]
