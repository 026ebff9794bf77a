"""Fused lazy bank-update tail: gather -> decayed Adam -> commit, one kernel.

The lazy update's tail (train/bank_optimizer.lazy_update) costs ~9 ms of
the 26 ms step at headline shapes (step_ablation_v5e_r3.json: row reads +
decayed Adam +3.3 ms, bank commit +2.7, mu/nu/last +0.3) while its real
traffic is ~250 MB (read+write 3 x [N=82k, 128] f32) = well under 1 ms at
HBM bandwidth: each piece is a separate kernel/fusion paying its own HBM
round trip plus XLA's serialized-scatter lowering.

This kernel does the whole row path in ONE pass per row block:

  per row i with 0 <= ids[i] < R (sentinel R and negatives skip - see below):
    read  w,m,v       = bank[id], mu[id], nu[id]      (per-row async DMA in)
    decay m *= d1[i]; v *= d2[i]; w *= dw[i]          (analytic catch-up)
    adam  m2 = (1-b1) g + b1 m;  v2 = (1-b2) g^2 + b2 v
          w2 = w - lr * (m2 c1inv) / (sqrt(v2 c2inv) + eps)
    write bank[id], mu[id], nu[id] = w2, m2, v2       (per-row async DMA out,
                                                       arrays aliased in-place)

d1/d2/dw are the per-row decay factors (b1^k, b2^k, (1-2 l2 lr)^(k+1))
computed by the caller from the 'last' touch steps - tiny [N] vectors;
c1inv/c2inv are the step's Adam bias corrections (scalar-prefetched).
The math is exactly train/bank_optimizer.adam_rows plus the decays of
lazy_update (same op order), pinned by tests/test_lazy_tail.py.

CORRECTNESS PRECONDITION (caller-enforced): every REAL row id appears at
most ONCE; duplicate positions must be masked to the sentinel ``R``.
Unlike the separate gather/scatter kernels (all reads happen before any
write), this kernel writes rows of earlier blocks before later blocks
read - a repeated id would double-apply the update.  The lazy callers
already produce unique-or-sentinel ids (sort path) or a sorted
first-occurrence mask (EqPlan path, where duplicates carry identical
totals so the first position IS the row's update).

Reference context: the reference's update is torch's dense per-table Adam
(basemodel.py:519-535); this kernel serves the documented lazy deviation
(PARITY.md).

STATUS (round-4 measurement): a consistent end-to-end LOSS - lazy step
30.0 ms vs the split path's 25.96 (272.8k/273.2k vs 315.6k ex/s, 2-run
A/B, bench_results/lazy_tail_v5e_r4.json).  The per-row read DMAs stall
each grid block (manual DMAs get no cross-grid-step pipelining) while the
split path's XLA gather+Adam chain is fused and overlapped.  Default is
therefore ``split`` (train/bank_optimizer._lazy_tail_impl);
``SATRANS_LAZY_TAIL=fused`` opts in.  Kept because it is the memory-lean
form (no [N, W] intermediates at all) and the equality tests pin it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_SLOTS = 16


def _kernel(ids_ref, hyper_ref, g_ref, dec_ref,
            in_bank, in_mu, in_nu, out_bank, out_mu, out_nu,
            wbuf, mbuf, vbuf, sems, *,
            rb: int, n_rows: int, lr: float, b1: float, b2: float,
            eps: float):
    """One grid step updates rows ids[base:base+rb].

    Scratch bufs are [rb, W] VMEM; reads drain before compute, compute
    before writes (Pallas program order).  Sentinel ids predicate BOTH the
    read and the write DMA - the compute runs on stale scratch for those
    lanes and its result is discarded.
    """
    base = pl.program_id(0) * rb
    srcs = (in_bank, in_mu, in_nu)
    bufs = (wbuf, mbuf, vbuf)
    outs = (out_bank, out_mu, out_nu)

    # ---- phase A: row reads (predicated, fully unrolled) ----
    for a in range(3):
        for r in range(rb):
            rid = ids_ref[base + r]

            def _start(a=a, r=r, rid=rid):
                pltpu.make_async_copy(
                    srcs[a].at[pl.ds(rid, 1)],
                    bufs[a].at[pl.ds(r, 1)],
                    sems.at[a, r % _SLOTS],
                ).start()
            pl.when((rid >= 0) & (rid < n_rows))(_start)
    for a in range(3):
        for r in range(rb):

            def _wait(a=a, r=r):
                pltpu.make_async_copy(
                    bufs[a].at[pl.ds(0, 1)],
                    bufs[a].at[pl.ds(0, 1)],
                    sems.at[a, r % _SLOTS],
                ).wait()
            pl.when((ids_ref[base + r] >= 0)
                    & (ids_ref[base + r] < n_rows))(_wait)

    # ---- phase B: decayed Adam on the whole block (VPU) ----
    g = g_ref[:].astype(F32)                    # [rb, W]
    d1 = dec_ref[:, 0:1]
    d2 = dec_ref[:, 1:2]
    dw = dec_ref[:, 2:3]
    c1inv = hyper_ref[0]
    c2inv = hyper_ref[1]
    m2 = (1.0 - b1) * g + b1 * (mbuf[:] * d1)
    v2 = (1.0 - b2) * (g * g) + b2 * (vbuf[:] * d2)
    w2 = wbuf[:] * dw - lr * ((m2 * c1inv)
                              / (jnp.sqrt(v2 * c2inv) + eps))
    wbuf[:] = w2
    mbuf[:] = m2
    vbuf[:] = v2

    # ---- phase C: row writes (same predicates) ----
    for a in range(3):
        for r in range(rb):
            rid = ids_ref[base + r]

            def _start(a=a, r=r, rid=rid):
                pltpu.make_async_copy(
                    bufs[a].at[pl.ds(r, 1)],
                    outs[a].at[pl.ds(rid, 1)],
                    sems.at[a, r % _SLOTS],
                ).start()
            pl.when((rid >= 0) & (rid < n_rows))(_start)
    for a in range(3):
        for r in range(rb):

            def _wait(a=a, r=r):
                pltpu.make_async_copy(
                    bufs[a].at[pl.ds(0, 1)],
                    outs[a].at[pl.ds(0, 1)],
                    sems.at[a, r % _SLOTS],
                ).wait()
            pl.when((ids_ref[base + r] >= 0)
                    & (ids_ref[base + r] < n_rows))(_wait)


def lazy_adam_rows(bank, mu, nu, ids, g, d1, d2, dw, c1inv, c2inv, *,
                   lr: float, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8, rb: int = 256,
                   interpret: bool = False):
    """In-place decayed-Adam commit of touched rows (module docstring).

    bank/mu/nu: [R, W] f32 (aliased in->out, donated where legal);
    ids: [N] int32, each REAL row at most once; any id outside [0, R)
    (sentinel or negative) skips;
    g: [N, W] f32 combined row gradients; d1/d2/dw: [N] f32 decay factors;
    c1inv/c2inv: scalar f32 Adam bias-correction reciprocals.
    Returns (bank, mu, nu).
    """
    n = ids.shape[0]
    if n == 0:
        return bank, mu, nu
    W = bank.shape[1]
    R = bank.shape[0]
    pad = (-n) % rb
    if pad:
        # sentinel-padded rows are skipped by the predicated DMAs
        ids = jnp.concatenate([ids, jnp.full((pad,), R, ids.dtype)])
        g = jnp.concatenate([g, jnp.zeros((pad, W), g.dtype)])
        zpad = jnp.zeros((pad,), d1.dtype)
        d1 = jnp.concatenate([d1, zpad])
        d2 = jnp.concatenate([d2, zpad])
        dw = jnp.concatenate([dw, zpad])
        n += pad
    dec = jnp.stack([d1, d2, dw], axis=1).astype(F32)       # [N, 3]
    hyper = jnp.stack([jnp.asarray(c1inv, F32),
                       jnp.asarray(c2inv, F32)])
    out = pl.pallas_call(
        functools.partial(_kernel, rb=rb, n_rows=R, lr=float(lr),
                          b1=float(b1), b2=float(b2), eps=float(eps)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # ids, hyper
            grid=(n // rb,),
            in_specs=[
                pl.BlockSpec((rb, W), lambda i, *_: (i, 0)),   # g
                pl.BlockSpec((rb, 3), lambda i, *_: (i, 0)),   # dec
                pl.BlockSpec(memory_space=pl.ANY),             # bank
                pl.BlockSpec(memory_space=pl.ANY),             # mu
                pl.BlockSpec(memory_space=pl.ANY),             # nu
            ],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((rb, W), F32),
                pltpu.VMEM((rb, W), F32),
                pltpu.VMEM((rb, W), F32),
                pltpu.SemaphoreType.DMA((3, _SLOTS)),
            ],
        ),
        out_shape=tuple(jax.ShapeDtypeStruct((R, W), F32) for _ in range(3)),
        # operands: ids, hyper, g, dec, bank, mu, nu -> alias the arrays
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, hyper, g, dec, bank, mu, nu)
    return out
