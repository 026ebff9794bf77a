"""Backward-interior ablation of the fused meta-transformer layer.

Round-3 step ablation pinned backward at 10.4 ms vs forward 6.6 on v5e
(step_ablation_v5e_r3.json: grad_no_bank 17.2 - fwd_loss 6.78) but nothing
showed WHERE inside the backward kernel that time sits - round 1's forward
interior ablation was what unlocked the masked-head rewrite (VERDICT r3
weak #4).  This bench knocks out one backward stage at a time via the
bench-only ``SATRANS_BWD_ABLATE`` knob (ops/pallas/meta_block._bwd_ablate;
outputs are mathematically wrong under a knockout - timing only):

  attn    - the per-head gradient contractions (the masked-head variant
            runs 4x attention MXU flops in all four backward contractions)
  meta_q / meta_k - the MetaNet+LN backward GEMM chains per path
  wqkv    - the input-projection grad GEMMs ([N,3d] concat + 2 GEMMs)
  lnout   - the outer LayerNorm backward

Each timing chains REPS fwd+bwd iterations inside one jit (x <- x - 1e-6*g)
so remote dispatch amortizes away.  Deltas vs 'full' attribute the stage
cost; the 'all' knockout bounds the irreducible floor (residual loads +
light recompute + dwout/do GEMMs).  Both attention variants are swept -
if the masked variant's 4x bwd flops bind, 'slice' shows it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.bwd_ablation
Artifact: bench_results/bwd_ablation_v5e_r4.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPS = 16
B, F, D_MODEL, HEADS, DOMS = 8192, 19, 32, 4, 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..nn import attention, metanet

    rng = np.random.default_rng(0)
    d = D_MODEL
    units = [d, 2 * d, d]
    P = metanet.param_size(units)
    params = attention.meta_transformer_init(jax.random.PRNGKey(2), d, units,
                                             share_kv_metanet=True)
    tables = {"Q": jnp.asarray(rng.normal(size=(DOMS, P)).astype(np.float32))}
    tables.update(K=tables["Q"], V=tables["Q"])
    x0 = jnp.asarray(rng.normal(size=(B, F, d)).astype(np.float32))
    dom = jnp.asarray(rng.integers(0, DOMS, size=B))
    onehot = jax.nn.one_hot(dom, DOMS)

    results = {}

    def timed(name, step):
        def run(x):
            out = lax.fori_loop(0, REPS, step, x)
            return jnp.sum(out)
        f = jax.jit(run)
        try:
            t0 = time.time()
            float(f(x0))
            log(f"  [{name}] compile {time.time() - t0:.0f}s")
            t0 = time.time()
            s = float(f(x0))
        except Exception as e:  # noqa: BLE001 - record and continue
            log(f"{name:44s} FAILED: {type(e).__name__} "
                f"{str(e).splitlines()[0][:120]}")
            results[name] = None
            return None
        dt = (time.time() - t0) / REPS * 1e3
        log(f"{name:44s} {dt:8.3f} ms   (sum {s:.3e})")
        results[name] = round(dt, 3)
        return dt

    def fwdbwd(ablate: str = "", attn: str = "masked", layers: int = 1):
        from ..ops.pallas import meta_block

        os.environ["SATRANS_BWD_ABLATE"] = ablate
        os.environ["SATRANS_ATTN"] = attn

        def loss(x):
            for l in range(layers):
                x = meta_block.fused_meta_layer_vjp(
                    x, params, tables, onehot, meta_units=units,
                    head_num=HEADS, train=True, seed=7 + l, block_b=128,
                    bwd="stash")
            return jnp.sum(x * x)

        def step(i, x):
            return x - 1e-6 * jax.grad(loss)(x)
        return step

    def fwd_only(attn: str = "masked"):
        from ..ops.pallas import meta_block

        os.environ["SATRANS_BWD_ABLATE"] = ""
        os.environ["SATRANS_ATTN"] = attn

        def step(i, x):
            return meta_block.fused_meta_layer_vjp(
                x, params, tables, onehot, meta_units=units,
                head_num=HEADS, train=True, seed=7, block_b=128)
        return step

    log(f"x [{B},{F},{d}] fp32; {REPS} chained reps in one jit; bwd=stash")
    try:
        for attn in ("masked", "slice"):
            tag = f"[{attn}]"
            timed(f"{tag} fwd only (train)", fwd_only(attn))
            timed(f"{tag} fwd+bwd full", fwdbwd("", attn))
            timed(f"{tag} fwd+bwd skip attn", fwdbwd("attn", attn))
            timed(f"{tag} fwd+bwd skip meta_qk",
                  fwdbwd("meta_q,meta_k", attn))
            timed(f"{tag} fwd+bwd skip wqkv", fwdbwd("wqkv", attn))
            timed(f"{tag} fwd+bwd skip lnout", fwdbwd("lnout", attn))
            timed(f"{tag} fwd+bwd skip ALL",
                  fwdbwd("attn,meta_q,meta_k,wqkv,lnout", attn))
        timed("[masked] 3-layer fwd+bwd full", fwdbwd("", "masked", 3))
    finally:
        os.environ.pop("SATRANS_BWD_ABLATE", None)
        os.environ.pop("SATRANS_ATTN", None)

    print(json.dumps({"workload": f"meta_layer_b{B}_f{F}_d{d}",
                      "unit": "ms/iter", "reps_in_jit": REPS,
                      "bwd": "stash", "results": results}))


if __name__ == "__main__":
    main()
