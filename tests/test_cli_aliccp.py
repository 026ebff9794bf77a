"""End-to-end CLI runs on a miniature generated alicpp.h5 / alimama.h5 -
exercises the real dataset branches (load, domain shift, vocab sizing,
per-domain report) without the full datasets."""

import numpy as np
import pandas as pd
import pytest

from satrans_tpu.data import aliccp, alimama


@pytest.fixture()
def mini_alicpp(tmp_path):
    """alicpp.h5 with the real 19 columns (tiny ids) + click label."""
    h5 = str(tmp_path / "alicpp.h5")
    n = 600
    rng = np.random.default_rng(0)
    cols = {"click": rng.integers(0, 2, n)}
    for c in aliccp.SPARSE_FEATURES:
        hi = min(aliccp.DATA_MAX[c], 50)
        cols[c] = rng.integers(1, hi + 1, n)
    cols["301"] = rng.integers(1, 4, n)  # 3 domains, 1-based
    frame = pd.DataFrame(cols)
    aliccp.build_h5(frame, frame, h5)
    return str(tmp_path)


def test_cli_alicpp_satrans(mini_alicpp, tmp_path):
    from satrans_tpu.cli import main as cli

    auc = cli.main([
        "--data_name", "alicpp", "--data_path", mini_alicpp,
        "--model_name", "SATrans", "--embedding_dim", "8",
        "--learning_rate", "0.01", "--domain_att_layer_num", "1",
        "--att_head_num", "2", "--meta_mode", "QK", "--domain_col", "301",
        "--flag", "sota", "--batch_size", "256",
        "--results_dir", str(tmp_path / "res")])
    assert 0.3 < auc <= 1.0
    row = (tmp_path / "res" / "alicpp_results.csv").read_text().strip()
    # overall + 3 per-domain aucs + loss
    assert len(row.split(",")) == 6


def test_cli_alicpp_star_net(mini_alicpp, tmp_path):
    from satrans_tpu.cli import main as cli

    auc = cli.main([
        "--data_name", "alicpp", "--data_path", mini_alicpp,
        "--model_name", "Star_Net", "--embedding_dim", "8",
        "--domain_col", "301", "--batch_size", "256",
        "--results_dir", str(tmp_path / "res")])
    assert 0.3 < auc <= 1.0


def test_cli_alimama_sparseprice(tmp_path):
    """alimama branch incl. the sparseprice flag (price label-encoded)."""
    from satrans_tpu.cli import main as cli

    n = 400
    rng = np.random.default_rng(1)
    import time as _t
    ts = _t.mktime(_t.strptime(alimama.SPLIT_TIMESTAMP, "%Y-%m-%d %H:%M:%S"))
    data = {c: rng.integers(0, 20, n) for c in alimama.SPARSE_FEATURES}
    data["pid"] = rng.integers(0, 2, n)
    data["shopping_level"] = rng.integers(1, 4, n)
    data["clk"] = rng.integers(0, 2, n)
    data["price"] = (rng.random(n) * 100)
    data["time_stamp"] = np.where(np.arange(n) < 300, ts - 10, ts + 10)
    from satrans_tpu.data import io
    io.save_dict_h5(str(tmp_path / "alimama.h5"),
                    {k: (v.astype(float) if k == "price"
                         else np.asarray(v).astype(int))
                     for k, v in data.items()})

    auc = cli.main([
        "--data_name", "alimama", "--data_path", str(tmp_path),
        "--model_name", "SATrans", "--embedding_dim", "8",
        "--learning_rate", "0.01", "--domain_att_layer_num", "1",
        "--att_head_num", "2", "--meta_mode", "QK",
        "--domain_col", "shopping_level", "--flag", "sota-pos-sparseprice",
        "--batch_size", "128", "--results_dir", str(tmp_path / "res")])
    assert 0.2 < auc <= 1.0
