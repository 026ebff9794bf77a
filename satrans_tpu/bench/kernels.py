"""Per-kernel microbenchmarks vs. speed-of-light (BASELINE.md kernel goal).

Covers the four hot paths named in BASELINE.json: embedding gather,
meta-parameter generation, interaction attention, and scoring.

Round-2 methodology fix (VERDICT r1 weak #7): every measurement loops REPS
iterations INSIDE one jit (lax.fori_loop with an i-dependent input so XLA
cannot hoist the body), then fences with one scalar device->host transfer -
the ~1.5 ms axon dispatch floor that polluted the round-1 artifact is
amortized away.

Run on the TPU:
    env PYTHONPATH=/root/repo:/root/.axon_site \
        python -m satrans_tpu.bench.kernels
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

REPS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(body, x0, name="", *operands):
    """body(i, carry, *operands) -> carry, looped REPS times in one jit;
    returns seconds/iter (scalar-fenced).

    ``operands`` are passed as jit ARGUMENTS, never closed over: a closure
    constant is embedded in the program sent to this container's remote
    compile service, and an 840 MB embedding bank takes longer to upload
    than to benchmark."""
    def run(x, *ops):
        def it(i, carry):
            return body(i, carry, *ops)
        out = lax.fori_loop(0, REPS, it, x)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0])

    f = jax.jit(run)
    log(f"[{name}] compiling...")
    t0 = time.time()
    float(f(x0, *operands))  # compile + warm
    log(f"[{name}] compile+warm {time.time() - t0:.1f}s")
    t0 = time.time()
    float(f(x0, *operands))
    dt = (time.time() - t0) / REPS
    log(f"[{name}] {dt * 1e3:.3f} ms/iter")
    return dt


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

    def gather_body(i, acc, bank_, ids_):
        # i-dependent ids prevent loop-invariant hoisting; clip keeps range
        e = embeddings.lookup_rows(bank_,
                                   jnp.clip(ids_ + i, 0, vocab_rows - 4),
                                   dim)
        return acc + jnp.sum(e[:, 0])

    dt = _timed(gather_body, jnp.zeros(()), "gather", bank, ids)
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

    def meta_body(i, acc, enc_, table_):
        out = core.mlp_apply(enc_, table_ + i * 1e-9, final_activation=False)
        return acc + jnp.sum(out)

    dt = _timed(meta_body, jnp.zeros(()), "meta_gen", enc, table)
    results["meta_param_generation"] = profiling.roofline(
        dt, flops=2 * 4 * d * P)

    # --- interaction attention (one meta-transformer layer fwd) ---
    params = attention.meta_transformer_init(jax.random.PRNGKey(2), d, units,
                                             share_kv_metanet=True)
    tables = {"Q": jnp.asarray(rng.normal(size=(4, P)).astype(np.float32))}
    tables.update(K=tables["Q"], V=tables["Q"])
    x = jnp.asarray(rng.normal(size=(batch, fields, d)).astype(np.float32))
    dom = jnp.asarray(rng.integers(0, 4, size=batch))
    flops = 2 * batch * fields * (3 * d * d + 2 * (d * 2 * d + 2 * d * d)
                                  + 2 * fields * d + d * d)

    def xla_layer_body(i, xc, params_, tables_, dom_):
        return attention.meta_transformer_apply(
            params_, xc, tables_, units, mode="QK", head_num=heads,
            train=False, domain_ids=dom_, dense_select=True)

    dt = _timed(xla_layer_body, x, "attn_xla", params, tables, dom)
    results["interaction_attention_xla"] = profiling.roofline(dt, flops=flops)

    # fused pallas layer (TPU only; SATRANS_FUSED=0 disables)
    import os
    if jax.default_backend() == "tpu" and \
            os.environ.get("SATRANS_FUSED", "1") != "0":
        from ..ops.pallas import meta_block
        onehot = jax.nn.one_hot(dom, 4)

        def fused_body(i, xc, params_, tables_, onehot_):
            return meta_block.fused_meta_layer_vjp(
                xc, params_, tables_, onehot_, meta_units=units,
                head_num=heads, train=False, block_b=128)

        dt = _timed(fused_body, x, "attn_fused", params, tables, onehot)
        results["interaction_attention_fused"] = profiling.roofline(
            dt, flops=flops)

    # --- scoring (head GEMV + sigmoid) ---
    head = core.linear_init(jax.random.PRNGKey(3), fields * d, 1)
    flat = x.reshape(batch, -1)

    def score_body(i, acc, head_, flat_):
        s = jax.nn.sigmoid(core.linear_apply(head_, flat_ + i * 1e-9))
        return acc + jnp.sum(s)

    dt = _timed(score_body, jnp.zeros(()), "scoring", head, flat)
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
