"""Pallas row gather: ``out[i] = arr[ids[i]]`` via per-row async DMA.

The read-side twin of ops/pallas/scatter.py.  XLA lowers a big row gather
on TPU into serialized per-row copies (~33 ns/row measured round 2 for the
scatter; the gather shows the same signature: 4.7 ms measured vs 0.097 ms
speed-of-light for the 82k-row forward bank gather,
bench_results/kernels_v5e_r2.json).  This kernel issues one async DMA per
row, HBM -> HBM (source row at a scalar-prefetched dynamic index, output
row at a static offset), fully unrolled per block so every SMEM load and
semaphore pick is at a static offset - the unroll is what beat XLA for the
scatter (bench/pallas_scatter_probe.py: the fori_loop variant only tied).

The multi-array form reads matching rows of several equal-row-count arrays
(bank + Adam mu + nu for the sparse update's row loads) in one kernel,
amortizing the block loop.  Probe: bench/pallas_gather_probe.py.

Preconditions:
 * every id must be in range [0, R) (callers clip - the forward gather's
   ids are vocab-bounded by construction; the lazy update clips once
   upstream, train/bank_optimizer.py),
 * duplicate ids are free (reads don't race),
 * N is padded internally to a multiple of ``rb`` by repeating the last id
   (the padded output rows are sliced off by the caller's reshape).

Reference context: the reference's lookup is one cuDNN gather per field per
step over ``nn.Embedding`` tables (basemodel.py:461-487); here all fields
read one packed bank (embeddings.py) and this kernel is the single hot
gather under it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOTS = 16


def _kernel(ids_ref, *refs, n_arrays: int, rb: int):
    """refs = (src_0..src_{A-1}, out_0..out_{A-1}, sems).  One grid step
    copies rows ids[base:base+rb] of every src into out[base:base+rb]:
    fully unrolled DMA issue, then unrolled drains."""
    srcs = refs[:n_arrays]
    outs = refs[n_arrays:2 * n_arrays]
    sems = refs[2 * n_arrays]
    base = pl.program_id(0) * rb
    for a in range(n_arrays):
        for r in range(rb):
            pltpu.make_async_copy(
                srcs[a].at[pl.ds(ids_ref[base + r], 1)],
                outs[a].at[pl.ds(base + r, 1)],
                sems.at[a, r % _SLOTS],
            ).start()
    for a in range(n_arrays):
        for r in range(rb):
            pltpu.make_async_copy(
                srcs[a].at[pl.ds(0, 1)],
                outs[a].at[pl.ds(0, 1)],
                sems.at[a, r % _SLOTS],
            ).wait()


def gather_rows(arrays, ids, *, rb: int = 256, interpret: bool = False):
    """Multi-array row gather: returns ``tuple(arr[ids] for arr in arrays)``.

    arrays: sequence of [R, W_a]; ids: [N] int32, all in [0, R).  Returns
    [N, W_a] per array.  N is padded internally to a multiple of ``rb`` by
    repeating the last id (extra reads, sliced off before returning).
    """
    arrays = tuple(arrays)
    assert arrays, arrays
    assert len({a.shape[0] for a in arrays}) == 1, \
        "all arrays must share the row count (one id set, one bound)"
    n = ids.shape[0]
    if n == 0:
        return tuple(jnp.zeros((0, a.shape[1]), a.dtype) for a in arrays)
    pad = (-n) % rb
    if pad:
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[-1:], (pad,))])
    grid = ((n + pad) // rb,)
    a_count = len(arrays)
    out = pl.pallas_call(
        functools.partial(_kernel, n_arrays=a_count, rb=rb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in arrays],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in arrays),
            scratch_shapes=[pltpu.SemaphoreType.DMA((a_count, _SLOTS))],
        ),
        out_shape=tuple(jax.ShapeDtypeStruct((n + pad, a.shape[1]), a.dtype)
                        for a in arrays),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, *arrays)
    out = out if isinstance(out, tuple) else (out,)
    if pad:
        out = tuple(o[:n] for o in out)
    return out
