"""Throughput of every SATrans variant, fused where supported.

The fused Pallas layers cover: variant='metanet' with ANY meta_mode
(containment semantics - 'Query', the CLI/reference default, transforms
Q only; 'QKV' is compute-identical to 'QK' since the reference never
meta-transforms V), 2- AND 3-matrix MetaNets, shared or 'pos' tables,
optional relu-out (ops/pallas/meta_block.py), and the 'gate' /
'bilinear' scenario transforms (ops/pallas/gate_block.py) - all with a
single scenario column (or multiple columns via the composite
product-domain table when the domain product is small).  This
tool pins one row per variant at the AliCCP sota shapes (19 fields, real
vocabs, d=32, 3 layers, 4 heads, batch 8192), ``bank_update='lazy'``;
``*_xla`` rows force the XLA path for the in-harness fused-vs-XLA
delta.  History: VERDICT r3 weak #2 asked for these paths to be measured
(round 4 first half); round 4 second half moved gate/bilinear/qkv/relu
onto fused kernels; round 5 closed meta_mode 'Q'/'K' alone (the
out-of-the-box default), 3-matrix MetaNets, and the multi-column path.

Run: ``PYTHONPATH=/root/repo:/root/.axon_site \
      python -m satrans_tpu.bench.variant_matrix [out.json]``
Timing uses a scalar device->host fence (block_until_ready does not
synchronize on the remote axon backend - ops/profiling.py).
"""

import json
import os
import sys
import time

import numpy as np

from ..data.aliccp import DATA_MAX as _DM, SPARSE_FEATURES as _SF

ALICCP_DATA_MAX = {k: _DM[k] for k in _SF}
BATCH = 8192
SCAN = 10
CHUNKS = 4

# name -> (SATrans kwargs, env SATRANS_FUSED value)
VARIANTS = {
    # the fused-kernel baseline, for the in-harness reference number
    "metanet_qk_fused": ({}, "1"),
    # the same config forced onto the faithful XLA path: the fused
    # kernel's own win, measured in the same harness
    "metanet_qk_xla": ({}, "0"),
    # fused via ops/pallas/gate_block.py (round-4 second half)
    "gate": ({"variant": "gate"}, "1"),
    "bilinear": ({"variant": "bilinear"}, "1"),
    # fused via meta_block.py: QKV == QK (V never meta-transformed),
    # relu_out is a kernel flag
    "qkv": ({"meta_mode": "QKV"}, "1"),
    "relu_out": ({"relu_out": True}, "1"),
    # onlyemb only changes how the [D+1, P] meta tables are produced
    # (scenario table holds them directly) - the fused kernel covers it;
    # measured to confirm
    "onlyemb": ({"only_emb": True}, "1"),
    # two scenario columns -> per-example meta params (the faithful
    # multi-column path, reference satrans.py multi-scenario variant)
    "multicol": ({"domain_cols": ["301", "122"],
                  "num_domains_list": [3, 13]}, "1"),
    # round 5: the CLI/reference default meta_mode 'Query' (Q transformed,
    # K raw - containment semantics) now rides the fused kernel
    "query_only": ({"meta_mode": "Query"}, "1"),
    "query_only_xla": ({"meta_mode": "Query"}, "0"),
    "k_only": ({"meta_mode": "K"}, "1"),
    # round 5: 3-matrix MetaNet (meta_dnn_hidden_units of length 3; the
    # middle matrix rides block-diagonally in the kernel)
    "metanet3": ({"meta_dnn_hidden_units": (64, 64, 32)}, "1"),
    "metanet3_xla": ({"meta_dnn_hidden_units": (64, 64, 32)}, "0"),
    # small-product multi-column (301 x 124 -> 12 combos): measures the
    # masked-vs-tiled crossover (SATRANS_TILED_MIN_ROWS flips the path)
    "multicol_small": ({"domain_cols": ["301", "124"],
                        "num_domains_list": [3, 2]}, "1"),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_variant(name: str, kwargs: dict, fused_env: str) -> dict:
    import jax

    from satrans_tpu.features import FeatureLayout, SparseFeature
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import Trainer

    os.environ["SATRANS_FUSED"] = fused_env
    cols = [SparseFeature(n, v + 2, 32) for n, v in ALICCP_DATA_MAX.items()]
    layout = FeatureLayout(cols)
    base = dict(layout=layout, domain_cols=["301"], num_domains_list=[3],
                domain_att_layer_num=3, att_head_num=4, meta_mode="QK",
                meta_dnn_hidden_units=(64, 32))
    base.update(kwargs)
    model = SATrans(**base)
    trainer = Trainer(model, seed=1021)
    trainer.compile(learning_rate=0.005, bank_update="lazy")
    trainer._strategy = trainer._resolve_strategy(None)
    trainer._ensure_initialized()
    trainer._build_steps()

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
    float(stats["loss"])
    compile_s = time.time() - t0
    log(f"[{name}] compile+first chunk: {compile_s:.1f}s")
    p, o, s, stats = trainer._train_scan(p, o, s, batch, y, w, rngs)
    float(stats["loss"])

    t0 = time.time()
    for _ in range(CHUNKS):
        p, o, s, stats = trainer._train_scan(p, o, s, batch, y, w, rngs)
    float(stats["loss"])
    dt = time.time() - t0
    steps = SCAN * CHUNKS
    eps = BATCH * steps / dt
    log(f"[{name}] {dt / steps * 1e3:.2f} ms/step -> {eps:,.0f} examples/s")
    del trainer, p, o, s
    return {"examples_per_s": round(eps, 1),
            "ms_per_step": round(dt / steps * 1e3, 2),
            "compile_s": round(compile_s, 1)}


def main():
    args = [a for a in sys.argv[1:]]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    out_path = args[0] if args else None
    results = {}
    for name, (kwargs, fused_env) in VARIANTS.items():
        if only is not None and name not in only:
            continue
        results[name] = run_variant(name, kwargs, fused_env)
    doc = {"workload": "satrans_aliccp_sota_shapes_b8192_lazy",
           "unit": "examples/s/chip", "results": results}
    line = json.dumps(doc, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
