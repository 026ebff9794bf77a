"""Measure the three embedding-bank update modes on the headline workload.

SATrans AliCCP sota config (19 fields, real vocab sizes, d=32, QK, 3 layers,
batch 8192) - the same workload as bench.py - once per ``bank_update`` mode:

* dense  - round-1 faithful path (combine-then-scatter + dense Adam)
* fused  - sparse bank grad + analytic-L2 dense pass + touched-row fixup
           (numerically identical to dense; default)
* lazy   - touched-rows-only sparse Adam (documented deviation, opt-in)

Run: ``PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.bank_modes``
Timing uses a scalar device->host fence (block_until_ready does not
synchronize on the remote axon backend - see ops/profiling.py).
"""

import json
import sys
import time

import numpy as np

from ..data.aliccp import DATA_MAX as _DM, SPARSE_FEATURES as _SF

# AliCCP vocab sizes (reference main.py:124-128), +2 like main.py:182 -
# single source of truth: satrans_tpu.data.aliccp.DATA_MAX.
ALICCP_DATA_MAX = {k: _DM[k] for k in _SF}
BATCH = 8192
SCAN = 10
CHUNKS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_mode(mode: str) -> float:
    import jax

    from satrans_tpu.features import FeatureLayout, SparseFeature
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import Trainer

    cols = [SparseFeature(name, vocab + 2, 32)
            for name, vocab in ALICCP_DATA_MAX.items()]
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["301"], num_domains_list=[3],
                    domain_att_layer_num=3, att_head_num=4, meta_mode="QK",
                    meta_dnn_hidden_units=(64, 32))
    trainer = Trainer(model, seed=1021)
    trainer.compile(learning_rate=0.005, bank_update=mode)
    trainer._strategy = trainer._resolve_strategy(None)
    trainer._ensure_initialized()
    trainer._build_steps()
    assert trainer._bank_mode == mode, trainer._bank_mode

    rng = np.random.default_rng(0)
    sparse = np.stack(
        [rng.integers(1, v + 1, size=(SCAN, BATCH))
         for v in ALICCP_DATA_MAX.values()], axis=2).astype(np.int32)
    batch = {"sparse": jax.device_put(sparse)}
    y = jax.device_put(rng.integers(0, 2, (SCAN, BATCH)).astype(np.float32))
    w = jax.device_put(np.ones((SCAN, BATCH), np.float32))
    rngs = jax.random.split(jax.random.PRNGKey(0), SCAN)

    t0 = time.time()
    p, o, s = trainer.params, trainer.opt_state, trainer.state
    p, o, s, stats = trainer._train_scan(p, o, s, batch, y, w, rngs)
    loss0 = float(stats["loss"])
    log(f"[{mode}] compile+first chunk: {time.time() - t0:.1f}s "
        f"loss={loss0 / (SCAN * BATCH):.6f}")
    p, o, s, stats = trainer._train_scan(p, o, s, batch, y, w, rngs)
    float(stats["loss"])

    t0 = time.time()
    for _ in range(CHUNKS):
        p, o, s, stats = trainer._train_scan(p, o, s, batch, y, w, rngs)
    float(stats["loss"])
    dt = time.time() - t0
    steps = SCAN * CHUNKS
    eps = BATCH * steps / dt
    log(f"[{mode}] {dt / steps * 1e3:.2f} ms/step -> {eps:,.0f} examples/s")
    del trainer, p, o, s
    return eps


def main():
    modes = sys.argv[1:] or ["dense", "fused", "lazy"]
    results = {}
    for mode in modes:
        results[mode] = round(run_mode(mode), 1)
    print(json.dumps({"workload": "satrans_aliccp_sota_b8192",
                      "unit": "examples/s/chip", "results": results}))


if __name__ == "__main__":
    main()
