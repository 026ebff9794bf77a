"""Pinned-seed end-to-end AUC regression against the committed golden
(PARITY_r02.json).  Catches silent numerics drift in the full pipeline -
library fit/predict in both bank-update modes and the CLI dataset branches -
since the real AliCCP/Alimama datasets are not available in CI."""

import json
import os

import numpy as np

from satrans_tpu.bench import parity_golden

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "PARITY_r02.json")


def test_auc_matches_committed_golden(tmp_path):
    with open(GOLDEN) as f:
        golden = json.load(f)
    results = parity_golden.run_all(str(tmp_path))
    assert set(results) == set(golden["auc"]), (
        "config set drifted from the golden file - regenerate PARITY_r02.json")
    tol = golden["tolerance"]
    for name, want in golden["auc"].items():
        got = results[name]
        assert abs(got - want) <= tol, (
            f"{name}: AUC {got:.6f} drifted from golden {want:.6f} "
            f"(tol {tol}); if intentional, regenerate PARITY_r02.json")
    # sanity: the flagship runs actually learned something (the tiny
    # 1-epoch Star_Net/Alimama runs exist for drift detection only)
    assert results["synthetic_satrans_dense"] > 0.6, results
    assert results["cli_alicpp_satrans"] > 0.6, results
