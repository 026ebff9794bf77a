"""Probe: can a Pallas per-row DMA pipeline beat XLA's row scatter?

Round-2 step ablation (bench/step_ablation.py, lazy_* variants) shows the
four scatter-sets of the lazy bank update cost ~8.6 ms/step: XLA lowers a
sorted 82k-row scatter into serialized row writes at ~17 GB/s effective.
The alternative is a Pallas kernel that issues one async DMA per updated
row (VMEM block -> HBM row at a dynamic index), which turns the question
into "what is the per-row DMA issue+drain rate on this chip?".

This probe measures exactly that on the production shape (bank [1.64M, 128]
fp32, N=81,920 sorted row ids) and prints a JSON comparison against the XLA
scatter, plus a REPS-amortized null control (same harness floor as
bench/scatter_primitives.py).  It does NOT change any production code -
the result decides whether ops/pallas/scatter.py is worth building.

Run: python -m satrans_tpu.bench.pallas_scatter_probe
CPU smoke: SATRANS_BENCH_TINY=1 JAX_PLATFORMS=cpu python -m ... (interpret)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

TINY = os.environ.get("SATRANS_BENCH_TINY", "") == "1"
ROWS = 4096 if TINY else 1_638_400
N = 1024 if TINY else 81_920
W = 128
RB = 512 if not TINY else 256     # update rows per grid step
REPS = 2 if TINY else 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _scatter_kernel(ids_ref, vals_ref, bank_ref, out_ref, sems, *,
                    variant: str):
    """One grid step: issue RB row DMAs (vals block row r -> out row ids[r]),
    then drain.

    variants:
      loop        fori_loop issue + fori_loop of per-copy waits (16 slots)
      unroll      fully unrolled issue/drain (static r: SMEM loads at static
                  offsets, no loop branches)
      bulkwait    unrolled issue on ONE semaphore + a single semaphore_wait
                  for the block's total byte count (DMA completion
                  increments the semaphore by bytes transferred)
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rb = vals_ref.shape[0]
    base = pl.program_id(0) * rb

    if variant == "loop":
        def issue(r, _):
            rid = ids_ref[base + r]
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(r, 1)],
                out_ref.at[pl.ds(rid, 1)],
                sems.at[r % 16],
            ).start()
            return _

        jax.lax.fori_loop(0, rb, issue, 0, unroll=1)

        def drain(r, _):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(0, 1)],
                out_ref.at[pl.ds(0, 1)],
                sems.at[r % 16],
            ).wait()
            return _

        jax.lax.fori_loop(0, rb, drain, 0, unroll=1)
    elif variant == "unroll":
        for r in range(rb):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(r, 1)],
                out_ref.at[pl.ds(ids_ref[base + r], 1)],
                sems.at[r % 16],
            ).start()
        for r in range(rb):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(0, 1)],
                out_ref.at[pl.ds(0, 1)],
                sems.at[r % 16],
            ).wait()
    elif variant == "bulkwait":
        for r in range(rb):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(r, 1)],
                out_ref.at[pl.ds(ids_ref[base + r], 1)],
                sems.at[0],
            ).start()
        row_bytes = W * 4
        pltpu.semaphore_wait(sems.at[0], value=rb * row_bytes)
    else:
        raise ValueError(variant)


def pallas_scatter(bank, ids, vals, *, interpret=False, variant="loop",
                   rb=None):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ids.shape[0]
    rb = rb or RB
    grid = (n // rb,)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, variant=variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rb, W), lambda i, *_: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        ),
        out_shape=jax.ShapeDtypeStruct(bank.shape, bank.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, vals, bank)


def main():
    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(ROWS, size=N, replace=False)).astype(np.int32)
    vals = rng.standard_normal((N, W)).astype(np.float32)
    bank = jnp.zeros((ROWS, W), jnp.float32)
    ids_d = jnp.asarray(ids)
    vals_d = jnp.asarray(vals)

    # correctness first
    got = pallas_scatter(bank, ids_d, vals_d, interpret=interpret)
    want = bank.at[ids_d].set(vals_d)
    err = float(jnp.max(jnp.abs(got - want)))
    log(f"max abs err vs XLA scatter: {err}")
    assert err == 0.0, err

    def timed(name, fn):
        @jax.jit
        def reps(bank, ids, vals):
            def body(i, b):
                return fn(b, ids, vals + i)  # vary vals to defeat CSE
            return jax.lax.fori_loop(0, REPS, body, bank)

        out = reps(bank, ids_d, vals_d)
        float(jnp.sum(out[ids[0]]))
        t0 = time.time()
        out = reps(bank, ids_d, vals_d)
        float(jnp.sum(out[ids[0]]))
        ms = (time.time() - t0) / REPS * 1e3
        log(f"[{name}] {ms:.2f} ms/scatter (REPS={REPS}, incl. loop floor)")
        return round(ms, 2)

    results = {}
    for variant, rb in (("loop", RB), ("unroll", 256), ("bulkwait", 256),
                        ("bulkwait", 1024)):
        key = f"pallas_{variant}_rb{rb}"
        try:
            got = pallas_scatter(bank, ids_d, vals_d, interpret=interpret,
                                 variant=variant, rb=rb)
            err = float(jnp.max(jnp.abs(got - want)))
            assert err == 0.0, err
            results[key] = timed(
                key, lambda b, i, v, variant=variant, rb=rb: pallas_scatter(
                    b, i, v, interpret=interpret, variant=variant, rb=rb))
        except Exception as e:  # noqa: BLE001 - record and move on
            log(f"[{key}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            results[key] = None
    results["xla_scatter_set"] = timed(
        "xla_scatter_set",
        lambda b, i, v: b.at[i].set(v, mode="drop", indices_are_sorted=True,
                                    unique_indices=True))
    results["null_body"] = timed("null_body", lambda b, i, v: b)

    print(json.dumps({
        "workload": f"scatter {N} sorted rows of {W} fp32 into "
                    f"[{ROWS}, {W}]",
        "method": f"{REPS} reps inside one jit; scalar fence",
        "ms": results,
    }))


if __name__ == "__main__":
    main()
