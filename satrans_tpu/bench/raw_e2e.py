"""Raw-schema end-to-end fixture: generated AliCCP-format inputs through
the FULL offline pipeline and the CLI (VERDICT r4 next #4).

The real AliCCP/Alimama datasets are not in CI, so the closest closable
proxy to the reference protocol (readme.md:17-19, main.py:96-134) is a
synthetic-but-real-schema run: this module GENERATES the reference's raw
input files - ``sample_skeleton_{train,test}.csv`` with GLOBAL feature
ids (aliccp_dataset_processing.py:158 MIN_V offsets) and
``common_features_{train,test}.csv`` with the \\x01/\\x02/\\x03-packed
history kvs (:254-295) - with a PLANTED domain-dependent click signal,
drives ``data.aliccp.preprocess_raw`` to build ``alicpp.h5``, and runs
``cli.main`` on it end-to-end (preprocess -> fit -> overall + per-domain
AUC -> results CSV).  ``tests/test_raw_e2e.py`` pins the resulting AUCs
against the committed ``RAWE2E_r05.json`` golden.

Run standalone to (re)generate the golden:
    python -m satrans_tpu.bench.raw_e2e RAWE2E_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

from ..data import aliccp

N_TRAIN = 80_000
N_TEST = 20_000
N_USERS = 1_500
SEED = 7
# small local-id caps keep the synthetic vocabs learnable at this scale
# while still exercising every field's MIN_V offset
CAP = 50


def _skeleton(n: int, rng) -> dict[str, np.ndarray]:
    cols: dict[str, np.ndarray] = {}
    for c in aliccp.SPARSE_FEATURES:
        hi = min(aliccp.DATA_MAX[c], CAP)
        local = rng.integers(1, hi + 1, n)
        cols[c] = local
    cols["301"] = rng.integers(1, 4, n)  # 3 scenarios, 1-based local
    # planted signal: domain-DEPENDENT feature effects, so per-domain AUC
    # is meaningful and a routing bug (wrong domain slicing) shows up
    d = cols["301"]
    f_a = cols["126"].astype(np.float64)  # vocab 3
    f_b = cols["121"].astype(np.float64) % 5
    coef = np.array([0.0, 1.2, -1.0, 0.8])[d]
    logits = coef * (f_a - 2.0) + 0.5 * (f_b - 2.0) * (d == 2) - 0.1
    p = 1.0 / (1.0 + np.exp(-logits))
    cols["click"] = (rng.random(n) < p).astype(np.int64)
    cols["purchase"] = (cols["click"] & (rng.random(n) < 0.1)).astype(
        np.int64)
    # to GLOBAL ids (what the raw skeleton carries; normalize_ids undoes)
    out = {}
    for c, v in cols.items():
        out[c] = v + (aliccp.MIN_V[c] - 1)
    return out


def _write_skeleton(path: str, cols: dict[str, np.ndarray]) -> None:
    import pandas as pd

    names = ["click", "purchase"] + list(aliccp.SPARSE_FEATURES)
    pd.DataFrame({c: cols[c] for c in names}).to_csv(path, index=False)


def _write_common_features(path: str, uids, rng) -> None:
    """One line per user: ``line_id,count,kvs`` with the packed history
    triples the parser expects (data/aliccp.py parse_common_features)."""
    with open(path, "w") as f:
        for i, uid in enumerate(uids):
            kvs = [f"101\x02{uid}\x031.0"]
            for col, vocab, base in (("109_14", 200, 1_000_100),
                                     ("110_14", 300, 1_000_200),
                                     ("150_14", 150, 1_000_300),
                                     ("127_14", 120, 1_000_400)):
                for _ in range(int(rng.integers(2, 7))):
                    fid = base + int(rng.integers(1, vocab))
                    score = round(float(rng.random()), 4)
                    kvs.append(f"{col}\x02{fid}\x03{score}")
            joined = "\x01".join(kvs)
            f.write(f"{i},{len(kvs)},{joined}\n")


def generate_raw(dirpath: str, n_train: int = N_TRAIN, n_test: int = N_TEST,
                 seed: int = SEED) -> dict[str, str]:
    rng = np.random.default_rng(seed)
    tr = _skeleton(n_train, rng)
    te = _skeleton(n_test, rng)
    # tie the skeleton's user ids to the common-features users so the
    # history join actually lands
    uids_local = rng.integers(1, N_USERS + 1, n_train + n_test)
    tr["101"] = uids_local[:n_train] + (aliccp.MIN_V["101"] - 1)
    te["101"] = uids_local[n_train:] + (aliccp.MIN_V["101"] - 1)
    paths = {
        "skeleton_train": os.path.join(dirpath, "sample_skeleton_train.csv"),
        "skeleton_test": os.path.join(dirpath, "sample_skeleton_test.csv"),
        "common_train": os.path.join(dirpath, "common_features_train.csv"),
        "common_test": os.path.join(dirpath, "common_features_test.csv"),
    }
    _write_skeleton(paths["skeleton_train"], tr)
    _write_skeleton(paths["skeleton_test"], te)
    users = np.arange(1, N_USERS + 1) + (aliccp.MIN_V["101"] - 1)
    _write_common_features(paths["common_train"], users[: N_USERS * 4 // 5],
                           rng)
    _write_common_features(paths["common_test"], users[N_USERS * 2 // 5:],
                           rng)
    return paths


def run(workdir: str) -> dict:
    """Generate raw files, run the offline pipeline + CLI, return AUCs."""
    from ..cli import main as cli

    raw = generate_raw(workdir)
    h5 = os.path.join(workdir, "alicpp.h5")
    # k=3 matches the CLI reader's history contract ({col}_3 datasets)
    aliccp.preprocess_raw(raw["skeleton_train"], raw["skeleton_test"],
                          raw["common_train"], raw["common_test"], h5, k=3)
    res_dir = os.path.join(workdir, "res")
    auc = cli.main([
        "--data_name", "alicpp", "--data_path", workdir,
        "--model_name", "SATrans", "--embedding_dim", "8",
        "--learning_rate", "0.01", "--domain_att_layer_num", "1",
        "--att_head_num", "2", "--meta_mode", "QK", "--domain_col", "301",
        "--flag", "sota", "--batch_size", "1024", "--seed", "1021",
        "--results_dir", res_dir])
    row = open(os.path.join(res_dir, "alicpp_results.csv")).read().strip()
    fields = row.split(",")
    # {config},{overall},{d1},{d2},{d3},{loss} (reference main.py:381-395)
    return {"overall_auc": float(fields[1]),
            "per_domain_auc": [float(v) for v in fields[2:5]],
            "test_loss": float(fields[5])}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    with tempfile.TemporaryDirectory() as td:
        res = run(td)
    doc = {"workload": f"raw_aliccp_pipeline_n{N_TRAIN}+{N_TEST}_seed{SEED}",
           "tolerance": 0.015, "results": res}
    line = json.dumps(doc, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
