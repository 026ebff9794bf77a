"""Pinned-seed AUC regression harness (VERDICT r1 item 3).

Runs a fixed set of deterministic end-to-end training configs - library API
on synthetic data (dense AND lazy bank modes), CLI on miniature generated
AliCCP/Alimama datasets - and reports their AUCs.  The committed golden
values live in ``PARITY_r04.json`` at the repo root; ``tests/
test_auc_regression.py`` re-runs this module and fails on drift, so a
change that silently alters end-to-end numerics is caught even though the
real datasets are not in the container.

Regenerate (ONLY after an intentional numerics change, on the 8-device CPU
config the tests use):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m satrans_tpu.bench.parity_golden PARITY_r04.json

(The output path is an argument, not a redirect: the CLI runs inside print
their run logs to stdout.)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np


def _synthetic_runs() -> dict:
    from .. import FeatureLayout
    from ..data.synthetic import synthetic_columns, synthetic_data
    from ..models import SATrans
    from ..train import Trainer, metrics

    cols = synthetic_columns(num_sparse=6, vocab=200, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=4096, num_sparse=6, vocab=200, seed=7)
    out = {}
    for mode in ("dense", "lazy"):
        model = SATrans(layout=layout, domain_cols=["domain"],
                        num_domains_list=[3], domain_att_layer_num=2,
                        att_head_num=2, meta_dnn_hidden_units=(16, 8))
        tr = Trainer(model, seed=1021)
        tr.compile(learning_rate=0.01, bank_update=mode)
        tr.fit(x, y, batch_size=512, epochs=2, shuffle=False, verbose=0)
        pred = tr.predict(x, batch_size=512)
        out[f"synthetic_satrans_{mode}"] = float(metrics.auc(y, pred))
    return out


def _planted_labels(rng, cols: dict, signal_cols, domain_col=None,
                    amp: float = 1.2):
    """Learnable labels: a sin-hashed per-id weight per signal column (plus
    a per-domain shift), squashed to Bernoulli probabilities.  Makes every
    golden pin a LEARNING check, not just a drift detector (VERDICT r2
    weak #4 - two pins sat at chance level)."""
    logit = np.zeros(len(next(iter(cols.values()))), np.float64)
    for i, c in enumerate(signal_cols):
        logit += amp * np.sin(np.asarray(cols[c], np.float64)
                              * (0.61803 + i) + 1.7 * i)
    if domain_col is not None:
        logit += 0.5 * (np.asarray(cols[domain_col], np.float64) - 2.0)
    return (rng.random(len(logit)) < 1.0 / (1.0 + np.exp(-logit))
            ).astype(np.int64)


def _mini_alicpp(tmp: str, n: int = 2400, num_domains: int = 3) -> str:
    import pandas as pd

    from ..data import aliccp

    os.makedirs(tmp, exist_ok=True)
    h5 = os.path.join(tmp, "alicpp.h5")
    rng = np.random.default_rng(0)
    cols = {}
    for c in aliccp.SPARSE_FEATURES:
        hi = min(aliccp.DATA_MAX[c], 50)
        cols[c] = rng.integers(1, hi + 1, n)
    cols["301"] = rng.integers(1, num_domains + 1, n)
    cols["click"] = _planted_labels(
        rng, cols, aliccp.SPARSE_FEATURES[:5], domain_col="301")
    frame = pd.DataFrame(cols)
    aliccp.build_h5(frame, frame, h5)
    return tmp


def _mini_alimama(tmp: str, n: int = 1600) -> str:
    import time as _t

    from ..data import alimama, io

    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(1)
    ts = _t.mktime(_t.strptime(alimama.SPLIT_TIMESTAMP, "%Y-%m-%d %H:%M:%S"))
    data = {c: rng.integers(0, 20, n) for c in alimama.SPARSE_FEATURES}
    data["pid"] = rng.integers(0, 2, n)
    data["shopping_level"] = rng.integers(1, 4, n)
    data["price"] = rng.random(n) * 100
    data["clk"] = _planted_labels(rng, data, alimama.SPARSE_FEATURES[:5],
                                  domain_col="shopping_level")
    data["time_stamp"] = np.where(np.arange(n) < 3 * n // 4, ts - 10, ts + 10)
    io.save_dict_h5(os.path.join(tmp, "alimama.h5"),
                    {k: (v.astype(float) if k == "price"
                         else np.asarray(v).astype(int))
                     for k, v in data.items()})
    return tmp


def _cli_runs(tmp: str) -> dict:
    from ..cli import main as cli

    out = {}
    ali = _mini_alicpp(os.path.join(tmp, "ali"))
    out["cli_alicpp_satrans"] = float(cli.main([
        "--data_name", "alicpp", "--data_path", ali,
        "--model_name", "SATrans", "--seed", "1021",
        "--embedding_dim", "8", "--learning_rate", "0.02", "--epochs", "3",
        "--domain_att_layer_num", "1", "--att_head_num", "2",
        "--meta_mode", "QK", "--domain_col", "301", "--flag", "sota",
        "--batch_size", "256", "--results_dir", os.path.join(tmp, "r1")]))
    out["cli_alicpp_star_net"] = float(cli.main([
        "--data_name", "alicpp", "--data_path", ali,
        "--model_name", "Star_Net", "--seed", "1021",
        "--embedding_dim", "8", "--learning_rate", "0.05", "--epochs", "3",
        "--domain_col", "301",
        "--batch_size", "256", "--results_dir", os.path.join(tmp, "r2")]))
    mama = _mini_alimama(os.path.join(tmp, "mama"))
    out["cli_alimama_satrans_sparseprice"] = float(cli.main([
        "--data_name", "alimama", "--data_path", mama,
        "--model_name", "SATrans", "--seed", "1021",
        "--embedding_dim", "8", "--learning_rate", "0.02", "--epochs", "3",
        "--domain_att_layer_num", "1", "--att_head_num", "2",
        "--meta_mode", "QK", "--domain_col", "shopping_level",
        "--flag", "sota-pos-sparseprice", "--batch_size", "128",
        "--results_dir", os.path.join(tmp, "r3")]))

    # every remaining BASELINE.md gate config gets an end-to-end pin
    # (DeepFM / AutoInt / DCN / xDeepFM single-task; MMoE / PLE / ESMM
    # multi-task heads) - same CLI surface, miniature planted-signal data.
    # lr/epochs tuned per model so every pin LEARNS (>0.6) on the mini
    # data: the FM pair diverges at 0.05 (BCE-sum), the MTL heads see only
    # ~800 rows/domain and need more passes.
    for name, lr, ep in (("DeepFM", "0.01", "4"), ("AutoInt", "0.05", "3"),
                         ("DCN", "0.05", "3"), ("xDeepFM", "0.01", "4"),
                         ("MMOE", "0.005", "4"), ("PLE", "0.005", "4")):
        out[f"cli_alicpp_{name.lower()}"] = float(cli.main([
            "--data_name", "alicpp", "--data_path", ali,
            "--model_name", name, "--seed", "1021",
            "--embedding_dim", "8", "--learning_rate", lr,
            "--epochs", ep, "--domain_col", "301",
            "--att_layer_num", "1", "--att_head_num", "2",
            "--batch_size", "256",
            "--results_dir", os.path.join(tmp, f"g_{name}")]))
    # ESMM hard-requires exactly 2 domains (reference esmm.py:48-49);
    # AliCCP's 301 has 3 (data_max, main.py:131 semantics), so like the
    # reference it can only run on Alimama's binary pid column
    out["cli_alimama_esmm"] = float(cli.main([
        "--data_name", "alimama", "--data_path", mama,
        "--model_name", "ESMM", "--seed", "1021",
        "--embedding_dim", "8", "--learning_rate", "0.05",
        "--epochs", "3", "--domain_col", "pid", "--batch_size", "128",
        "--results_dir", os.path.join(tmp, "g_esmm")]))

    # Round 4 (VERDICT r3 weak #6): the remaining 8 dispatchable model
    # groups get end-to-end pins too - WDL / NFM / AFM / PNN / FiBiNET /
    # AdaSparse / SharedBottom and the legacy Star_Trans lineage (all
    # four, incl. Starv2's attention-reg aux loss path).
    # AdaSparse diverges at 0.05 on the mini data (pruned-DNN + BCE-sum)
    for name, lr, ep in (("WDL", "0.05", "3"), ("NFM", "0.02", "3"),
                         ("AFM", "0.05", "4"), ("PNN", "0.02", "3"),
                         ("FiBiNET", "0.02", "3"), ("AdaSparse", "0.01", "3"),
                         ("SharedBottom", "0.005", "4")):
        out[f"cli_alicpp_{name.lower()}"] = float(cli.main([
            "--data_name", "alicpp", "--data_path", ali,
            "--model_name", name, "--seed", "1021",
            "--embedding_dim", "8", "--learning_rate", lr,
            "--epochs", ep, "--domain_col", "301",
            "--att_layer_num", "1", "--att_head_num", "2",
            "--batch_size", "256",
            "--results_dir", os.path.join(tmp, f"g_{name}")]))
    for name, lr, ep in (("Star_Trans", "0.02", "3"),
                         ("Starv2_Trans", "0.02", "3"),
                         ("Starv3_Trans", "0.02", "3"),
                         ("Starv4_Trans", "0.02", "3")):
        out[f"cli_alicpp_{name.lower()}"] = float(cli.main([
            "--data_name", "alicpp", "--data_path", ali,
            "--model_name", name, "--seed", "1021",
            "--embedding_dim", "8", "--learning_rate", lr,
            "--epochs", ep, "--domain_col", "301",
            "--domain_att_layer_num", "1", "--att_head_num", "2",
            "--meta_mode", "QK", "--merge", "dot",
            "--batch_size", "256",
            "--results_dir", os.path.join(tmp, f"g_{name}")]))
    return out


def run_all(tmp: str | None = None) -> dict:
    if tmp is None:
        tmp = tempfile.mkdtemp()
    for sub in ("ali", "mama", "r1", "r2", "r3"):
        os.makedirs(os.path.join(tmp, sub), exist_ok=True)
    results = {}
    results.update(_synthetic_runs())
    results.update(_cli_runs(tmp))
    return results


def main():
    import jax

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    results = run_all()
    for k, v in sorted(results.items()):
        print(f"{k}: {v:.6f}", file=sys.stderr, flush=True)
    payload = json.dumps({
        "platform": jax.devices()[0].platform,
        "n_devices": len(jax.devices()),
        "tolerance": 2e-3,
        "auc": {k: round(v, 6) for k, v in sorted(results.items())},
    }, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
    else:
        print(payload)


if __name__ == "__main__":
    main()
