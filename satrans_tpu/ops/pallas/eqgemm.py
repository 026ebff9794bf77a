"""Pallas equality-GEMM: duplicate-summed gradients without the HBM matrix.

The lazy bank update's combine (embeddings.eqgemm_combine) computes
``s[f, i] = sum_j [ids[f, i] == ids[f, j]] * g[f, j]`` as an XLA einsum.
At the headline shapes ([10, 8192] ids, W=128) the einsum is HBM-bound, not
MXU-bound: XLA materializes the [F, B, B] equality matrix (1.3 GB in bf16)
and streams it back into the dot - measured 2.63 ms on v5e where the MXU
time of the 172 GFLOP contraction is ~0.9 ms and the real operands (ids,
g, s) total ~80 MB (bench/eqgemm_probe.py).

This kernel never materializes the equality matrix: each grid step builds
one ``[TI, B]`` equality tile in VMEM from the scalar ids (a broadcast
int compare) and contracts it against the field's full ``[B, W]`` gradient
block, which stays resident in VMEM across the field's row tiles (its block
index only changes with the field index, so the Pallas pipeline does not
re-fetch it).  HBM traffic drops to ids + g + s.

Status (round-4 measurement): standalone the kernel beats the einsum
(2.58 vs 2.97 ms) but end-to-end the lazy step shows NO win (xla 315.7k/
316.5k vs pallas 314.6k/315.2k ex/s, 2x2 A/B on v5e) - XLA overlaps the
einsum with the neighboring update ops while the opaque pallas_call
serializes.  Default is therefore ``xla`` (embeddings._eqgemm_impl);
``SATRANS_EQGEMM=pallas`` opts in where the [F, B, B] HBM tensor is the
binding constraint.

Numerics: the contraction runs as ONE bf16 MXU pass with f32 accumulation -
byte-for-byte the error class of what the XLA path already does on TPU,
where the default f32 dot is a single bf16 pass (measured identical max
rel err 1.369e-3 vs a 6-pass reference for BOTH paths,
bench_results/eqgemm_probe_v5e_r4.json; kernel 2.58 ms vs XLA einsum
2.97 ms at the headline shape, with zero HBM equality tensor vs 2.7 GB).
The CPU/XLA fallback keeps exact f32.  The row-DMA scatter's bit-identity
precondition is precision-INDEPENDENT here: duplicate positions i1, i2 of
one field have identical equality rows, and every output row contracts the
full j range in the same subtile order, so their dots are the same
computation -> byte-identical results (asserted on hardware by the probe
and in interpret mode by tests/test_pallas_eqgemm.py).

Reference context: the reference has no combine at all - its embedding
update is torch's dense per-table Adam (basemodel.py:519-535); the combine
exists to serve the lazy deviation documented in PARITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _kernel(idcol_ref, idrow_ref, g_ref, out_ref):
    """One (field, row-tile) step: s[f, i0:i0+TI] = eq_tile @ g[f]."""
    col = idcol_ref[0]                      # [TI, 1] int32
    row = idrow_ref[0]                      # [1, B] int32
    e = (col == row).astype(jnp.bfloat16)   # [TI, B] - VMEM only
    out_ref[0] = jax.lax.dot(e, g_ref[0],
                             preferred_element_type=F32)


def eqgemm_positions(ids_fb, g_fb, *, tile: int = 256,
                     interpret: bool = False):
    """``s[f, i] = sum_j [ids_fb[f, i] == ids_fb[f, j]] * g_fb[f, j]``.

    ids_fb: [F, B] int32 (non-negative); g_fb: [F, B, W] f32.
    Returns [F, B, W] f32.  Duplicate positions within a field receive
    byte-identical rows (same contraction, same order).  Cross-field
    boundary-shared rows are NOT handled here - the caller
    (embeddings.eqgemm_combine) overwrites them with exact f32 totals.
    """
    F_, B = ids_fb.shape
    W = g_fb.shape[2]
    ti = min(tile, B)
    pad = (-B) % ti
    ids_p = ids_fb
    g_p = g_fb
    if pad:
        # padded i-rows (id -1) match only padded j-columns (also -1); the
        # garbage rows they produce are sliced off below, and no REAL id is
        # negative so real rows never match a padded column
        ids_p = jnp.concatenate(
            [ids_fb, jnp.full((F_, pad), -1, ids_fb.dtype)], axis=1)
        g_p = jnp.concatenate(
            [g_fb, jnp.zeros((F_, pad, W), g_fb.dtype)], axis=1)
    bp = B + pad
    out = pl.pallas_call(
        _kernel,
        grid=(F_, bp // ti),
        in_specs=[
            pl.BlockSpec((1, ti, 1), lambda f, i: (f, i, 0)),
            pl.BlockSpec((1, 1, bp), lambda f, i: (f, 0, 0)),
            pl.BlockSpec((1, bp, W), lambda f, i: (f, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ti, W), lambda f, i: (f, i, 0)),
        out_shape=jax.ShapeDtypeStruct((F_, bp, W), F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids_p[:, :, None], ids_p[:, None, :], g_p.astype(jnp.bfloat16))
    return out[:, :B] if pad else out
