"""Per-kernel microbenchmarks vs. speed-of-light (BASELINE.md kernel goal).

Covers the four hot paths named in BASELINE.json: embedding gather,
meta-parameter generation, interaction attention, and scoring, each timed
with a device-transfer fence and reported against the v5e roofline
(ops/profiling.py).

Run on the TPU:
    env PYTHONPATH=/root/repo:/root/.axon_site \
        python -m satrans_tpu.bench.kernels
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(batch=8192, fields=19, dim=32, vocab_rows=6_571_968, heads=4):
    from .. import embeddings
    from ..features import FeatureLayout, SparseFeature
    from ..nn import attention, core, metanet
    from ..ops import profiling

    results = {}
    rng = np.random.default_rng(0)

    # --- embedding gather (packed bank) ---
    cols = [SparseFeature("f", vocab_rows - 2, dim)]
    layout = FeatureLayout(cols)
    bank = embeddings.bank_init(jax.random.PRNGKey(0), layout)
    ids = jnp.asarray(rng.integers(0, vocab_rows - 4,
                                   size=(batch, fields)).astype(np.int32))
    gather = jax.jit(lambda p, i: embeddings.lookup_rows(p, i, dim))
    dt = profiling.time_fn(gather, bank, ids, iters=20)
    bytes_moved = batch * fields * 128 * 4  # physical 128-lane rows
    results["embedding_gather"] = profiling.roofline(dt,
                                                     bytes_moved=bytes_moved)

    # --- meta-parameter generation (scenario encoder, per-domain) ---
    d = dim
    units = [d, 2 * d, d]
    P = metanet.param_size(units)
    enc = core.mlp_init(jax.random.PRNGKey(1), d, [P], init_std=1e-4,
                        final_activation=False)
    table = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    meta_gen = jax.jit(lambda p, t: core.mlp_apply(p, t,
                                                   final_activation=False))
    dt = profiling.time_fn(meta_gen, enc, table, iters=20)
    results["meta_param_generation"] = profiling.roofline(
        dt, flops=2 * 4 * d * P)

    # --- interaction attention (one meta-transformer layer fwd) ---
    params = attention.meta_transformer_init(jax.random.PRNGKey(2), d, units,
                                             share_kv_metanet=True)
    tables = {"Q": jnp.asarray(rng.normal(size=(4, P)).astype(np.float32))}
    tables.update(K=tables["Q"], V=tables["Q"])
    x = jnp.asarray(rng.normal(size=(batch, fields, d)).astype(np.float32))
    dom = jnp.asarray(rng.integers(0, 4, size=batch))
    layer = jax.jit(lambda p, x: attention.meta_transformer_apply(
        p, x, tables, units, mode="QK", head_num=heads, train=False,
        domain_ids=dom, dense_select=True))
    dt = profiling.time_fn(layer, params, x, iters=20)
    flops = 2 * batch * fields * (3 * d * d + 2 * (d * 2 * d + 2 * d * d)
                                  + 2 * fields * d + d * d)
    results["interaction_attention_xla"] = profiling.roofline(dt, flops=flops)

    # fused pallas layer (TPU only; SATRANS_FUSED=0 disables)
    import os
    if jax.default_backend() == "tpu" and \
            os.environ.get("SATRANS_FUSED", "1") != "0":
        from ..ops.pallas import meta_block
        onehot = jax.nn.one_hot(dom, 4)
        fused = jax.jit(lambda p, x: meta_block.fused_meta_layer_vjp(
            x, p, tables, onehot, meta_units=units, head_num=heads,
            train=False, block_b=128))
        dt = profiling.time_fn(fused, params, x, iters=20)
        results["interaction_attention_fused"] = profiling.roofline(
            dt, flops=flops)

    # --- scoring (head GEMV + sigmoid) ---
    head = core.linear_init(jax.random.PRNGKey(3), fields * d, 1)
    flat = x.reshape(batch, -1)
    score = jax.jit(lambda p, f: jax.nn.sigmoid(core.linear_apply(p, f)))
    dt = profiling.time_fn(score, head, flat, iters=20)
    results["scoring"] = profiling.roofline(
        dt, flops=2 * batch * fields * d,
        bytes_moved=batch * fields * d * 4)

    return results


if __name__ == "__main__":
    out = run()
    for name, r in out.items():
        log(f"{name}: {r['seconds']*1e3:.3f} ms "
            f"(speed-of-light {r['speed_of_light_s']*1e3:.3f} ms, "
            f"bound={r['bound']})")
    print(json.dumps({k: {kk: (round(vv, 6) if isinstance(vv, float) else vv)
                          for kk, vv in v.items()}
                      for k, v in out.items()}))
