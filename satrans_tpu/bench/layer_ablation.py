"""Amortized fused-layer ablations: where do the 7.3 ms/layer go?

Each timing loops REPS times INSIDE one jit (lax.fori_loop) so the remote
dispatch overhead (~1.5 ms/call through the axon tunnel) is amortized away -
the flaw that made the round-1 kernels artifact unreadable (VERDICT weak 7).
The loop carries the activations through the layer (x <- layer(x)) so
iterations serialize without host round-trips; fwd+bwd variants carry
``x - 1e-6 * dx`` to keep the chain live.

Variants answer the round-2 design questions:
* fused vs XLA, fwd and fwd+bwd         - the kernel's real on-chip win
* train=True vs False (dropout PRNG)     - cost of the 4 in-kernel masks
* block_b 128 / 256 / 512                - tile-size sensitivity
* 3 chained layers                       - the mega-kernel's target number

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.layer_ablation
"""

from __future__ import annotations

import json
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
        """step(i, x) -> x; chained REPS times inside one jit."""
        def run(x):
            out = lax.fori_loop(0, REPS, step, x)
            return jnp.sum(out)
        f = jax.jit(run)
        try:
            t0 = time.time()
            float(f(x0))  # compile + warm
            log(f"  [{name}] compile {time.time() - t0:.0f}s")
            t0 = time.time()
            s = float(f(x0))
        except Exception as e:  # noqa: BLE001 - a variant OOM must not
            # abort the sweep; record and move on
            log(f"{name:48s} FAILED: {type(e).__name__} "
                f"{str(e).splitlines()[0][:120]}")
            results[name] = None
            return None
        dt = (time.time() - t0) / REPS * 1e3
        log(f"{name:48s} {dt:8.3f} ms   (sum {s:.3e})")
        results[name] = round(dt, 3)
        return dt

    def fused_fwd(train, block_b, layers=1, seed0=7):
        from ..ops.pallas import meta_block

        def step(i, x):
            for l in range(layers):
                x = meta_block.fused_meta_layer_vjp(
                    x, params, tables, onehot, meta_units=units,
                    head_num=HEADS, train=train, seed=seed0 + l,
                    block_b=block_b)
            return x
        return step

    def fused_fwdbwd(train, block_b, layers=1, seed0=7, bwd=None,
                     attn_cap=None):
        from ..ops.pallas import meta_block

        def loss(x):
            for l in range(layers):
                x = meta_block.fused_meta_layer_vjp(
                    x, params, tables, onehot, meta_units=units,
                    head_num=HEADS, train=train, seed=seed0 + l,
                    block_b=block_b, bwd=bwd, attn_cap=attn_cap)
            return jnp.sum(x * x)

        def step(i, x):
            g = jax.grad(loss)(x)
            return x - 1e-6 * g
        return step

    def xla_fwd(train):
        def step(i, x):
            return attention.meta_transformer_apply(
                params, x, tables, units, mode="QK", head_num=HEADS,
                train=train, domain_ids=dom, dense_select=True,
                rng=jax.random.PRNGKey(3) if train else None)
        return step

    def xla_fwdbwd(train):
        def loss(x):
            y = attention.meta_transformer_apply(
                params, x, tables, units, mode="QK", head_num=HEADS,
                train=train, domain_ids=dom, dense_select=True,
                rng=jax.random.PRNGKey(3) if train else None)
            return jnp.sum(y * y)

        def step(i, x):
            return x - 1e-6 * jax.grad(loss)(x)
        return step

    log(f"x [{B},{F},{d}] fp32; {REPS} chained reps in one jit")
    timed("fused fwd eval b128", fused_fwd(False, 128))
    timed("fused fwd train b128", fused_fwd(True, 128))
    timed("fused fwd+bwd train b128 STASH",
          fused_fwdbwd(True, 128, bwd="stash"))
    timed("fused fwd+bwd train b128 RECOMPUTE",
          fused_fwdbwd(True, 128, bwd="recompute"))
    timed("fused fwd+bwd train b256 STASH",
          fused_fwdbwd(True, 256, bwd="stash"))
    timed("fused fwd+bwd train b128 STASH cap48 (g=2)",
          fused_fwdbwd(True, 128, bwd="stash", attn_cap=48))
    timed("fused 3-layer fwd+bwd train b128 STASH",
          fused_fwdbwd(True, 128, 3, bwd="stash"))
    timed("fused 3-layer fwd+bwd train b128 RECOMPUTE",
          fused_fwdbwd(True, 128, 3, bwd="recompute"))
    timed("xla fwd eval", xla_fwd(False))
    timed("xla fwd train", xla_fwd(True))
    timed("xla fwd+bwd train", xla_fwdbwd(True))

    print(json.dumps({"workload": f"meta_layer_b{B}_f{F}_d{d}",
                      "unit": "ms/iter", "reps_in_jit": REPS,
                      "results": results}))


if __name__ == "__main__":
    main()
