"""Probe-mode (return_scores) prediction throughput: fused vs XLA.

VERDICT r4 weak #3: the showattn/instattn probes need the attention
probabilities, which previously forced prediction onto the XLA path.
The metanet kernel now emits the scores (stash forward + block-diagonal
unpack, ops/pallas/meta_block.fused_meta_layer_with_scores); this tool
measures probe-mode inference at the AliCCP sota shapes both ways.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python -m satrans_tpu.bench.probe_throughput [out.json]
"""

import json
import sys
import time

import numpy as np

from .variant_matrix import ALICCP_DATA_MAX

BATCH = 32_768   # the reference's eval batch (main.py:81)
REPS = 20


def run_mode(fused: bool) -> dict:
    import os

    import jax
    import jax.numpy as jnp

    # the probe routing defaults to XLA (measured faster - module doc);
    # the fused arm must OPT IN or this bench would compare XLA with XLA
    os.environ["SATRANS_PROBE_FUSED"] = "1" if fused else "0"

    from ..features import FeatureLayout, SparseFeature
    from ..models import SATrans

    cols = [SparseFeature(n, v + 2, 32) for n, v in ALICCP_DATA_MAX.items()]
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["301"],
                    num_domains_list=[3], domain_att_layer_num=3,
                    att_head_num=4, meta_mode="QK",
                    meta_dnn_hidden_units=(64, 32),
                    use_fused_kernel=fused)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sparse = np.stack([rng.integers(1, v + 1, size=BATCH)
                       for v in ALICCP_DATA_MAX.values()], axis=1)
    batch = {"sparse": jax.device_put(jnp.asarray(sparse, jnp.int32))}

    @jax.jit
    def probe(p, s, b):
        pred, _, _, scores = model.apply(p, s, b, return_scores=True)
        # the probes reduce the maps on device (train/attention_probe.py);
        # a per-(layer, head) mean stands in for that reduction here
        return pred, [sc.mean(axis=0) for sc in scores]

    t0 = time.time()
    pred, means = probe(params, state, batch)
    jax.block_until_ready(pred)
    float(np.asarray(means[0]).ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        pred, means = probe(params, state, batch)
    float(np.asarray(pred)[0])
    dt = (time.time() - t0) / REPS
    name = "fused" if fused else "xla"
    print(f"[{name}] {dt * 1e3:.2f} ms/batch -> "
          f"{BATCH / dt:,.0f} examples/s (compile {compile_s:.1f}s)",
          file=sys.stderr, flush=True)
    return {"examples_per_s": round(BATCH / dt, 1),
            "ms_per_batch": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1)}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    doc = {"workload": f"satrans_probe_return_scores_b{BATCH}",
           "unit": "examples/s/chip",
           "results": {"fused_scores": run_mode(True),
                       "xla_scores": run_mode(False)}}
    line = json.dumps(doc, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
