"""Serving (inference) throughput of the AOT Predictor on one chip.

BASELINE.md's protocol includes the reference's 4x-train eval batch
(32768, main.py:353); round 1 only correctness-tested the Predictor.  This
measures the compiled scorer at the headline SATrans AliCCP config, with
the timed loop chained in-device (scores feed a running sum; one scalar
fence at the end - block_until_ready does not synchronize on the remote
axon backend).

Two numbers:
* ``device_path_ms``: the pure on-device score program (batch already on
  device, dispatch amortized over an in-jit fori_loop) - the serving
  compute ceiling.
* ``e2e_examples_per_sec``: the real ``Predictor.predict`` path including
  host->device transfer, tail padding, and per-call dispatch - what a
  serving process sees per request.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.serving_throughput
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from ..data.aliccp import DATA_MAX as _DM, SPARSE_FEATURES as _SF

# AliCCP vocab sizes (reference main.py:124-128), +2 like main.py:182 -
# single source of truth: satrans_tpu.data.aliccp.DATA_MAX.
ALICCP_DATA_MAX = {k: _DM[k] for k in _SF}
EVAL_BATCH = 32768     # reference main.py:353: predict batch = 4x train
REPS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from .. import serving
    from ..features import FeatureLayout, SparseFeature
    from ..models import SATrans
    from ..train import Trainer

    cols = [SparseFeature(name, vocab + 2, 32)
            for name, vocab in ALICCP_DATA_MAX.items()]
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["301"], num_domains_list=[3],
                    domain_att_layer_num=3, att_head_num=4, meta_mode="QK",
                    meta_dnn_hidden_units=(64, 32))
    trainer = Trainer(model, seed=1021)
    trainer.compile()
    trainer._strategy = trainer._resolve_strategy(None)
    trainer._ensure_initialized()

    pred = serving.Predictor(model, trainer.params, trainer.state,
                             batch_size=EVAL_BATCH)
    t0 = time.time()
    pred.aot_compile()
    log(f"aot_compile: {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    feats = {name: rng.integers(1, v + 1, EVAL_BATCH).astype(np.int32)
             for name, v in ALICCP_DATA_MAX.items()}
    batch_np = layout.batch_from_dict(feats)
    batch_dev = {k: jax.device_put(jnp.asarray(v))
                 for k, v in batch_np.items()}

    # --- device-path ceiling: REPS chained scores inside one jit.
    # The batch MUST be i-dependent: a loop-invariant apply() is hoisted
    # out of the fori_loop by XLA and one score would be counted REPS
    # times (the round-1 artifact had this flaw).  Rolling the sparse ids
    # by i (mod each vocab) keeps shapes/ranges identical per iteration.
    def chained(params, state, batch):
        vocab = jnp.asarray([c.vocab for c in layout.sparse], jnp.int32)

        def body(i, acc):
            b = dict(batch, sparse=(batch["sparse"] + i) % vocab[None, :])
            p, _, _ = model.apply(params, state, b, train=False)
            return acc + jnp.sum(p)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    f = jax.jit(chained)
    float(f(trainer.params, trainer.state, batch_dev))  # compile+warm
    t0 = time.time()
    s = float(f(trainer.params, trainer.state, batch_dev))
    dev_ms = (time.time() - t0) / REPS * 1e3
    dev_eps = EVAL_BATCH / (dev_ms / 1e3)
    log(f"device path: {dev_ms:.2f} ms/batch -> {dev_eps:,.0f} examples/s "
        f"(sum {s:.3e})")

    # --- end-to-end Predictor on a MULTI-BATCH request (the eval-loop
    # shape: one predict() over the whole test split, reference
    # main.py:353) at pipeline depths 1 (serial, the round-2 number),
    # 2 and 4 (overlapped host->device staging).
    n_batches = 8
    big = {name: np.tile(v, n_batches) for name, v in feats.items()}
    ref = None
    e2e = {}
    for depth in (1, 2, 4):
        out = pred(big, pipeline_depth=depth)  # warm + correctness
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out, ref)
        t0 = time.time()
        out = pred(big, pipeline_depth=depth)
        dt = time.time() - t0
        eps = EVAL_BATCH * n_batches / dt
        e2e[f"depth{depth}"] = round(eps, 1)
        log(f"e2e depth={depth}: {dt / n_batches * 1e3:.2f} ms/batch -> "
            f"{eps:,.0f} examples/s (out[0]={out[0]:.4f})")

    print(json.dumps({
        "workload": f"satrans_aliccp_sota_serve_b{EVAL_BATCH}",
        "device_path_ms": round(dev_ms, 2),
        "device_examples_per_sec": round(dev_eps, 1),
        "e2e_examples_per_sec": e2e["depth1"],
        "e2e_overlapped_examples_per_sec": e2e,
    }))


if __name__ == "__main__":
    main()
