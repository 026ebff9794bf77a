"""Raw-schema pipeline end-to-end, pinned to the committed golden.

VERDICT r4 next #4: one command reproduces the full reference workflow
from RAW inputs in CI - generated ``sample_skeleton_*.csv`` (global ids)
and ``common_features_*.csv`` (packed history kvs) -> the real
``data.aliccp.preprocess_raw`` pipeline (MIN_V remap, history edge
parse/remap, top-k, h5 schema) -> ``cli.main`` (fit -> overall +
per-domain AUC -> results CSV).  The planted signal is domain-dependent,
so the per-domain pins are LEARNING checks on the real data path, not
just drift detectors."""

import json
import os

import numpy as np

from satrans_tpu.bench import raw_e2e
from satrans_tpu.data import aliccp, io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "RAWE2E_r05.json")


def test_raw_pipeline_cli_end_to_end(tmp_path):
    with open(GOLDEN) as f:
        golden = json.load(f)
    res = raw_e2e.run(str(tmp_path))
    tol = golden["tolerance"]
    want = golden["results"]
    assert abs(res["overall_auc"] - want["overall_auc"]) <= tol, res
    for got, exp in zip(res["per_domain_auc"], want["per_domain_auc"]):
        assert abs(got - exp) <= tol, res
    # the planted domain-dependent signal must actually be learned
    assert res["overall_auc"] > 0.6
    assert all(a > 0.6 for a in res["per_domain_auc"])

    # the pipeline's intermediate artifacts and final schema are all there
    h5 = str(tmp_path / "alicpp.h5")
    edges = io.load_h5(h5, "101_10914/top3_train")
    assert edges.shape[1] == 3  # (uid, fid, score) rows
    train = aliccp.load_split(h5, "ctr_train", ["click", "109_14", "301"],
                              k=3)
    assert train["109_14"].shape == (raw_e2e.N_TRAIN, 3)  # 0-padded top-k
    assert train["109_14"].min() >= 0
    # MIN_V remap produced 1-based local ids within the synthetic caps
    assert train["301"].min() >= 1 and train["301"].max() <= 3
    assert np.asarray(train["click"]).mean() > 0.1
