"""Probe: can a Pallas per-row DMA pipeline beat XLA's row gather?

Round-2 kernel roofline (bench_results/kernels_v5e_r2.json): the forward
embedding gather of 82k packed rows measured 4.7 ms (~2-3 on-chip) against
a 0.097 ms speed-of-light - the worst SoL ratio of any hot kernel left.
The row-DMA scatter kernel (ops/pallas/scatter.py) proved XLA's per-row
serialization costs ~33 ns/row while raw async DMAs run at ~9; this probe
asks whether the same holds on the READ side, for

  (a) the forward gather ``rows = bank[ids]`` (N=81,920 from [1.64M, 128]),
  (b) the lazy/fused update's 3-array row read (bank+mu+nu at the same ids,
      ~3.6 ms in bench_results/step_ablation_v5e_r2.json lazy_* knockouts).

Variants: fully-unrolled per-block DMA issue/drain (the scatter winner),
a single-semaphore bulk wait, and block-size sweeps.  The destination is
the output array itself (HBM -> HBM row copies; no VMEM round-trip).
It does NOT change production code - the result decides whether
ops/pallas/gather.py is worth building (VERDICT r2 item 4).

Run: python -m satrans_tpu.bench.pallas_gather_probe
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
REPS = 2 if TINY else 16
_SLOTS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _gather_kernel(ids_ref, *refs, n_arrays: int, rb: int, variant: str):
    """refs = (src_0..src_{A-1}, out_0..out_{A-1}, sems).  One grid step
    copies rows ids[base:base+rb] of every src into out[base:base+rb]."""
    import jax  # noqa: F401  (kept local: probe file, no top-level jax)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    srcs = refs[:n_arrays]
    outs = refs[n_arrays:2 * n_arrays]
    sems = refs[2 * n_arrays]
    base = pl.program_id(0) * rb

    if variant == "unroll":
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
    elif variant == "bulkwait":
        for a in range(n_arrays):
            for r in range(rb):
                pltpu.make_async_copy(
                    srcs[a].at[pl.ds(ids_ref[base + r], 1)],
                    outs[a].at[pl.ds(base + r, 1)],
                    sems.at[a, 0],
                ).start()
        for a in range(n_arrays):
            pltpu.semaphore_wait(sems.at[a, 0], value=rb * W * 4)
    else:
        raise ValueError(variant)


def pallas_gather(srcs, ids, *, interpret=False, variant="unroll", rb=256):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    srcs = tuple(srcs)
    n = ids.shape[0]
    grid = (n // rb,)
    a_count = len(srcs)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_arrays=a_count, rb=rb,
                          variant=variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in srcs],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in srcs),
            scratch_shapes=[pltpu.SemaphoreType.DMA((a_count, _SLOTS))],
        ),
        out_shape=tuple(jax.ShapeDtypeStruct((n, s.shape[1]), s.dtype)
                        for s in srcs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, *srcs)
    return out if isinstance(out, tuple) else (out,)


def main():
    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    # production distribution: duplicate-laden (batch ids), NOT unique
    ids = rng.integers(0, ROWS, size=N).astype(np.int32)
    banks = [jnp.asarray(rng.standard_normal((ROWS, W)).astype(np.float32))
             for _ in range(3)]
    ids_d = jnp.asarray(ids)

    want = jnp.take(banks[0], ids_d, axis=0)
    got = pallas_gather(banks[:1], ids_d, interpret=interpret)[0]
    err = float(jnp.max(jnp.abs(got - want)))
    log(f"max abs err vs XLA gather: {err}")
    assert err == 0.0, err

    def timed(name, fn):
        # banks are OPERANDS, never closures: a closed-over 840 MB constant
        # is embedded in the program shipped to the remote compile service
        # (~18 min "compile") - see docs/PERFORMANCE.md round-2 methodology.
        # The body must consume the FULL gather output: an `out[0, 0]` fence
        # lets XLA narrow the take to ONE row (a first version of this probe
        # printed exactly-speed-of-light XLA numbers that way).  Summing the
        # output costs one extra read pass - identical for every variant.
        @jax.jit
        def reps(banks_in, ids):
            def body(i, acc):
                outs = fn(banks_in, ids + (i - i))  # defeat CSE
                return acc + sum(jnp.sum(o) for o in outs)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        reps(banks, ids_d).block_until_ready()
        t0 = time.time()
        float(reps(banks, ids_d))
        ms = (time.time() - t0) / REPS * 1e3
        log(f"[{name}] {ms:.2f} ms/gather (REPS={REPS}, incl. loop floor)")
        return round(ms, 2)

    results = {}
    # bulkwait (one semaphore_wait for the block's byte total) is rejected
    # by this jax version (semaphore_wait refuses DMA semaphores) - the
    # multi-slot unrolled drain is the only issue/drain scheme probed.
    # TINY/interpret shrinks the unroll: interpret mode executes each of
    # the rb * n_arr * 2 copies as traced ops (minutes at rb=512 x3).
    grids = (("unroll", 64, 1), ("unroll", 64, 3)) if TINY else \
        (("unroll", 256, 1), ("unroll", 512, 1),
         ("unroll", 512, 3), ("unroll", 256, 3))
    for variant, rb, n_arr in grids:
        key = f"pallas_{variant}_rb{rb}_x{n_arr}"
        try:
            outs = pallas_gather(banks[:n_arr], ids_d, interpret=interpret,
                                 variant=variant, rb=rb)
            for o, b in zip(outs, banks):
                e = float(jnp.max(jnp.abs(o - jnp.take(b, ids_d, axis=0))))
                assert e == 0.0, e
            results[key] = timed(
                key, lambda bk, i, v=variant, r=rb, k=n_arr: pallas_gather(
                    bk[:k], i, interpret=interpret, variant=v, rb=r))
        except Exception as e:  # noqa: BLE001 - record and move on
            log(f"[{key}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            results[key] = None
    results["xla_take_x1"] = timed(
        "xla_take_x1", lambda bk, i: (jnp.take(bk[0], i, axis=0),))
    results["xla_take_x3"] = timed(
        "xla_take_x3", lambda bk, i: tuple(jnp.take(b, i, axis=0)
                                           for b in bk))
    results["null_body"] = timed(
        "null_body", lambda bk, i: (jnp.zeros((N, W), jnp.float32)
                                    + i[0].astype(jnp.float32),))

    print(json.dumps({
        "workload": f"gather {N} rows of {W} fp32 from [{ROWS}, {W}] "
                    "(x1 and x3 arrays)",
        "method": f"{REPS} reps inside one jit; scalar fence",
        "ms": results,
    }))


if __name__ == "__main__":
    main()
