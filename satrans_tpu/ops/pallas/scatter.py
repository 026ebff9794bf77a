"""Pallas row scatter-set: in-place `arr[ids[i]] = vals[i]` via per-row DMA.

XLA lowers a row scatter on TPU into serialized per-row updates at ~33 ns/row
(~17 GB/s effective for 512 B rows) AND schedules each of the lazy bank
update's scatters (bank, mu, nu - train/bank_optimizer.py) on the train
step's critical path: measured +8.6 ms/step of the 35 ms round-2 step
(bench/step_ablation.py lazy_* knockouts).  The speed-of-light is ~0.1 ms -
the update writes only 42 MB.

This kernel instead issues one async DMA per updated row from a VMEM block
of values straight to the HBM row at a dynamic index (ids scalar-prefetched
to SMEM, fully unrolled per block so every SMEM load/semaphore pick is at a
static offset), with the destination array ALIASED input->output so the
write is genuinely in place.  Measured ~9 ns/row on v5e
(bench/pallas_scatter_probe.py: 0.77 ms vs XLA's 2.67 ms on-chip for the
production shape) - and the multi-array form commits bank+mu+nu rows in one
kernel, amortizing the block loop across the three arrays.

Semantics and preconditions (asserted by the caller, bank_optimizer):
 * every id must be IN RANGE [0, R) - there is no OOB drop path (the DMA
   would write out of bounds); callers with sentinel ids keep XLA's
   ``mode='drop'`` scatter,
 * duplicate ids are allowed ONLY if they carry identical values (writers
   race; the lazy EqPlan combine guarantees bit-equal duplicates - within a
   field via one equality-GEMM reduction order, and for boundary-shared rows
   via embeddings.eqgemm_combine's single broadcast cross-field total),
 * N must be a multiple of the row block; callers pad by repeating the
   last (id, value) row, which rewrites one real row with its own value.

Reference context: the reference's embedding update is cuDNN/ATen dense
Adam over each ``nn.Embedding`` (basemodel.py:519-535 full-table L2);
the sparse lazy mode this kernel serves is the documented deviation in
PARITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOTS = 16


def _kernel(ids_ref, *refs, n_arrays: int, rb: int, n_rows: int,
            drop_oob: bool):
    """refs = (vals_0..vals_{A-1}, in_0..in_{A-1}, out_0..out_{A-1}, sems).

    One grid step commits rows [base, base+rb) of every array: fully
    unrolled DMA issue (one per row per array) then unrolled drains.
    With ``drop_oob`` every row's start AND wait are predicated on the same
    ``0 <= id < n_rows`` test (sentinel AND negative ids are skipped - the
    full XLA ``mode='drop'`` semantics; a negative id would otherwise DMA
    before the array base) - the predicates match, so every issued DMA is
    drained.
    """
    vals = refs[:n_arrays]
    outs = refs[2 * n_arrays:3 * n_arrays]
    sems = refs[3 * n_arrays]
    base = pl.program_id(0) * rb
    for a in range(n_arrays):
        for r in range(rb):
            rid = ids_ref[base + r]

            def _start(a=a, r=r, rid=rid):
                pltpu.make_async_copy(
                    vals[a].at[pl.ds(r, 1)],
                    outs[a].at[pl.ds(rid, 1)],
                    sems.at[a, r % _SLOTS],
                ).start()

            if drop_oob:
                pl.when((rid >= 0) & (rid < n_rows))(_start)
            else:
                _start()
    for a in range(n_arrays):
        for r in range(rb):

            def _wait(a=a, r=r):
                pltpu.make_async_copy(
                    vals[a].at[pl.ds(0, 1)],
                    outs[a].at[pl.ds(0, 1)],
                    sems.at[a, r % _SLOTS],
                ).wait()

            if drop_oob:
                rid_w = ids_ref[base + r]
                pl.when((rid_w >= 0) & (rid_w < n_rows))(_wait)
            else:
                _wait()


def scatter_rows_set(arrays, ids, values, *, rb: int = 256,
                     interpret: bool = False, drop_oob: bool = False):
    """In-place multi-array row overwrite: ``arrays[a][ids[i]] = values[a][i]``.

    arrays: sequence of [R, W_a] (aliased in/out - donated by XLA where
    legal); ids: [N] int32, all in [0, R) - or, with ``drop_oob``, any id
    outside [0, R) (negative or >= R) is skipped by the predicated DMA.
    NOTE this is stricter than XLA ``.at[].set(mode='drop')``, which WRAPS
    negative ids numpy-style; callers that support both impls sentinel
    negatives to R first so the two agree (bank_optimizer).
    values: matching [N, W_a].  Returns the updated arrays (tuple).  N is
    padded internally to a multiple of ``rb`` by repeating the last row of
    ids/values (a duplicate write of an identical value, or a dropped
    sentinel).
    """
    arrays = tuple(arrays)
    values = tuple(values)
    assert len(arrays) == len(values) and arrays, (arrays, values)
    assert len({a.shape[0] for a in arrays}) == 1, \
        "all arrays must share the row count (one id set, one OOB bound)"
    if ids.shape[0] == 0:
        # no rows touched (e.g. every field lives in the side bank): the
        # XLA .at[].set path is a no-op here, and a zero-trip Pallas grid
        # is untested on hardware - return the aliased inputs unchanged.
        return arrays
    n = ids.shape[0]
    a_count = len(arrays)
    pad = (-n) % rb
    if pad:
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[-1:], (pad,))])
        values = tuple(
            jnp.concatenate([v, jnp.broadcast_to(v[-1:], (pad,) + v.shape[1:])])
            for v in values)
        n += pad
    grid = (n // rb,)
    in_specs = (
        [pl.BlockSpec((rb, v.shape[1]), lambda i, *_: (i, 0))
         for v in values]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in arrays]
    )
    # operand order: (scalar ids, vals..., arrays...); aliases map each
    # array operand (index 1 + a_count + a, counting the scalar) to output a
    aliases = {1 + a_count + a: a for a in range(a_count)}
    out = pl.pallas_call(
        functools.partial(_kernel, n_arrays=a_count, rb=rb,
                          n_rows=arrays[0].shape[0], drop_oob=drop_oob),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in arrays),
            scratch_shapes=[pltpu.SemaphoreType.DMA((a_count, _SLOTS))],
        ),
        out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in arrays),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, *values, *arrays)
    return out if isinstance(out, tuple) else (out,)
