"""Lazy-vs-dense convergence at REALISTIC sparsity (VERDICT r2 item 3).

The ``bank_update='lazy'`` deviation (skipped momentum tail, decoupled lazy
L2 - PARITY.md) matters exactly when most bank rows go untouched for many
steps.  Round 2 only evidenced it at toy sparsity (vocab 200/field, 16
steps - every row touched constantly).  This bench runs the real regime:

* Zipf(1.1) ids over a >=1M-physical-row bank (one 4M-logical-row field
  plus 400k/200k/... - the AliCCP shape, reference main.py:124-128),
* the real SATrans architecture (dim 32, 3 meta-transformer layers,
  4 heads, QK meta - readme.md:19) with l2_reg_embedding=1e-5 and the
  sota lr 0.005, batch 8192,
* >=500 optimizer steps with planted (learnable) labels,
* loss/AUC trajectories checkpointed every 25 steps for bank_update in
  {dense (faithful), fused (exact-parity control), lazy (deviation)}.

Output: ``bench_results/lazy_convergence_r3.json`` + a table in
docs/PERFORMANCE.md.  Run on the real TPU:

    python -m satrans_tpu.bench.lazy_convergence bench_results/lazy_convergence_r3.json
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os

# Round 4 (VERDICT r3 item 7): the momentum-tail deviation compounds with
# the untouched-steps count k, and 500 steps only reaches k-small regimes -
# env knobs let the committed 1-epoch-scale run (~5000 steps = the real
# AliCCP epoch, main.py:328) reuse this harness unchanged:
#   SATRANS_CONV_STEPS / _CHECK / _MODES (comma list)
STEPS = int(os.environ.get("SATRANS_CONV_STEPS", "500"))
BATCH = 8192
EVAL_N = 65536
CHECK_EVERY = int(os.environ.get("SATRANS_CONV_CHECK", "25"))
MODES = tuple(os.environ.get("SATRANS_CONV_MODES",
                             "dense,fused,lazy").split(","))
# scan_steps for the fit chunks: 'lazy_stale' only pipelines INSIDE a
# scan chunk (chunk boundaries flush), so its convergence run needs
# multi-step chunks to actually exercise the staleness
SCAN_STEPS = int(os.environ.get("SATRANS_CONV_SCAN", "1"))

# AliCCP-shaped vocabs (reference main.py:124-128 dominates at 4.3M/695k/
# 472k/444k): 4.62M logical rows -> 1.16M physical rows at dim 32 (pack 4)
VOCABS = {"u": 4_000_000, "i": 400_000, "c": 200_000, "s1": 10_000,
          "s2": 10_000, "s3": 2_000, "s4": 2_000, "s5": 1_000, "s6": 500}
DIM = 32
LR = 0.005
L2 = 1e-5


def _zipf_ids(rng, n, vocab, a=1.1):
    z = rng.zipf(a, size=n)
    return ((z - 1) % vocab + 1).astype(np.int64)


def _planted_logit(x):
    """Deterministic per-id ground truth: each field contributes a
    sin-hashed weight, so labels are learnable only through the embeddings."""
    logit = np.zeros(len(next(iter(x.values()))), np.float64)
    for f, (name, ids) in enumerate(sorted(x.items())):
        if name == "domain":
            logit += 0.15 * (ids.astype(np.float64) - 2.0)
        else:
            logit += 0.35 * np.sin(ids.astype(np.float64) * (0.61803 + f)
                                   + 1.7 * f)
    return logit


def _make_data(seed, n):
    rng = np.random.default_rng(seed)
    x = {name: _zipf_ids(rng, n, v) for name, v in VOCABS.items()}
    x["domain"] = rng.integers(1, 4, size=n).astype(np.int64)
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-_planted_logit(x)))
         ).astype(np.float32)
    return x, y


def _touch_stats(x, layout):
    """Fraction of physical bank rows touched per batch / cumulatively -
    documents the sparsity regime this bench exercises."""
    from .. import embeddings
    rp = embeddings.pack_factor(DIM)
    split = layout.small_split(embeddings.SMALL_TABLE_THRESHOLD)
    offs = np.asarray(split["large_offsets"])
    li = split["large_idx"]
    names = [layout.sparse[i].name for i in li]
    total_rows = split["large_rows"] // rp
    ids = np.stack([x[n] for n in names], 1) + offs[None, :]
    phys = ids // rp
    per_batch = [len(np.unique(phys[i * BATCH:(i + 1) * BATCH]))
                 for i in range(0, min(20, len(phys) // BATCH))]
    return {"physical_rows": int(total_rows),
            "touched_per_batch_mean": float(np.mean(per_batch)),
            "touched_per_batch_frac": float(np.mean(per_batch) / total_rows),
            "touched_cumulative_frac":
                float(len(np.unique(phys)) / total_rows)}


def run(out_path: str | None = None):
    from .. import FeatureLayout
    from ..features import SparseFeature
    from ..models import SATrans
    from ..train import Trainer, metrics

    cols = [SparseFeature(n, v + 2, DIM) for n, v in VOCABS.items()]
    cols.append(SparseFeature("domain", 5, DIM))
    layout = FeatureLayout(cols)

    n_train = STEPS * BATCH
    print(f"generating {n_train} train + {EVAL_N} eval examples ...")
    x, y = _make_data(0, n_train)
    xe, ye = _make_data(1, EVAL_N)
    sparsity = _touch_stats(x, layout)
    print("sparsity:", sparsity)

    results = {"config": {"steps": STEPS, "batch": BATCH, "lr": LR,
                          "l2": L2, "dim": DIM,
                          "vocabs": VOCABS, "zipf_a": 1.1,
                          "layers": 3, "heads": 4},
               "sparsity": sparsity, "checkpoint_steps": [], "modes": {}}

    for mode in MODES:
        model = SATrans(layout=layout, domain_cols=["domain"],
                        num_domains_list=[3], domain_att_layer_num=3,
                        att_head_num=4, meta_dnn_hidden_units=(2 * DIM, DIM),
                        l2_reg_embedding=L2)
        tr = Trainer(model, seed=1021)
        tr.compile(learning_rate=LR, bank_update=mode)
        steps_done = 0
        aucs, loglosses, losses, ckpts = [], [], [], []
        t0 = time.time()
        while steps_done < STEPS:
            k = min(CHECK_EVERY, STEPS - steps_done)
            sl = slice(steps_done * BATCH, (steps_done + k) * BATCH)
            xs = {kk: v[sl] for kk, v in x.items()}
            hist = tr.fit(xs, y[sl], batch_size=BATCH, epochs=1,
                          shuffle=False, verbose=0,
                          scan_steps=min(SCAN_STEPS, k))
            steps_done += k
            pred = tr.predict(xe, batch_size=4 * BATCH)
            aucs.append(float(metrics.auc(ye, pred)))
            loglosses.append(float(metrics.log_loss(ye, pred)))
            losses.append(float(hist.history["loss"][-1]))
            ckpts.append(steps_done)
            print(f"{mode} step {steps_done}: eval auc {aucs[-1]:.5f} "
                  f"logloss {loglosses[-1]:.5f}")
        results["modes"][mode] = {"eval_auc": aucs, "eval_logloss": loglosses,
                                  "train_loss": losses,
                                  "wall_s": time.time() - t0}
        results["checkpoint_steps"] = ckpts

    d = results["modes"]
    results["final_auc"] = {m: d[m]["eval_auc"][-1] for m in d}
    if "lazy" in d and "dense" in d:
        results["max_abs_auc_delta_lazy_vs_dense"] = float(np.max(np.abs(
            np.asarray(d["lazy"]["eval_auc"])
            - np.asarray(d["dense"]["eval_auc"]))))
    if "lazy_stale" in d and "dense" in d:
        results["max_abs_auc_delta_stale_vs_dense"] = float(np.max(np.abs(
            np.asarray(d["lazy_stale"]["eval_auc"])
            - np.asarray(d["dense"]["eval_auc"]))))
    if "fused" in d and "dense" in d:
        results["max_abs_auc_delta_fused_vs_dense"] = float(np.max(np.abs(
            np.asarray(d["fused"]["eval_auc"])
            - np.asarray(d["dense"]["eval_auc"]))))
    print(json.dumps({k: v for k, v in results.items() if k != "modes"},
                     indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out_path)
    return results


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else None)
