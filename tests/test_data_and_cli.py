"""Data pipeline + CLI driver tests on synthetic fixtures."""

import os

import numpy as np
import pandas as pd
import pytest

from satrans_tpu.data import aliccp, alimama, io, loader


def test_aliccp_normalize_ids():
    df = pd.DataFrame({
        "click": [1, 2],
        "101": [1, 100],
        "301": [aliccp.MIN_V["301"], aliccp.MIN_V["301"] + 2],
        "205": [aliccp.MIN_V["205"] - 5, aliccp.MIN_V["205"] + 7],
    })
    out = aliccp.normalize_ids(df)
    # 1-based per-field ids; ids below the field range clamp to 0
    assert out["101"].tolist() == [1, 100]
    assert out["301"].tolist() == [1, 3]
    assert out["205"].tolist() == [0, 8]
    assert out["click"].tolist() == [1, 2]


def test_aliccp_topk_and_history():
    uids = [1, 1, 1, 2, 2]
    fids = [10, 11, 12, 20, 21]
    scores = [0.5, 0.9, 0.1, 0.3, 0.8]
    edges = aliccp.topk_edges(uids, fids, scores, k=2)
    hist = aliccp.history_feature_frame(edges, k=2, col="10914")
    by_uid = dict(zip(hist["101"], hist["10914"]))
    assert by_uid[1] == (11, 10)   # top-2 by score
    assert by_uid[2] == (21, 20)
    # padding
    edges1 = aliccp.topk_edges([3], [30], [1.0], k=2)
    h1 = aliccp.history_feature_frame(edges1, k=2, col="10914")
    assert tuple(h1["10914"].iloc[0]) == (30, 0)


def test_aliccp_h5_roundtrip(tmp_path):
    h5 = str(tmp_path / "alicpp.h5")
    n = 50
    rng = np.random.default_rng(0)
    frame = pd.DataFrame({
        "click": rng.integers(0, 2, n),
        "101": rng.integers(1, 20, n),
        "301": rng.integers(1, 4, n),
    })
    hist = aliccp.history_feature_frame(
        aliccp.topk_edges(rng.integers(1, 20, 100), rng.integers(1, 50, 100),
                          rng.random(100), k=3), k=3, col="10914")
    aliccp.build_h5(frame, frame, h5, history={"10914": hist}, k=3)
    loaded = aliccp.load_split(h5, "ctr_train", ["click", "101", "301",
                                                "10914"], k=3)
    assert loaded["click"].shape == (n,)
    assert loaded["10914"].shape == (n, 3)
    np.testing.assert_array_equal(loaded["101"], frame["101"].values)


def test_alimama_preprocess_and_split(tmp_path):
    n = 40
    rng = np.random.default_rng(1)
    import time as _t
    split_ts = _t.mktime(_t.strptime(alimama.SPLIT_TIMESTAMP,
                                     "%Y-%m-%d %H:%M:%S"))
    raw = pd.DataFrame({
        "user": rng.integers(1, 10, n),
        "time_stamp": np.where(np.arange(n) < 30, split_ts - 1000,
                               split_ts + 1000),
        "adgroup_id": rng.integers(1, 5, n),
        "pid": rng.choice(["430548_1007", "430539_1007"], n),
        "nonclk": 0,
        "clk": rng.integers(0, 2, n),
    })
    users = pd.DataFrame({
        "userid": np.arange(1, 10),
        "cms_segid": rng.integers(0, 5, 9),
        "cms_group_id": rng.integers(0, 5, 9),
        "final_gender_code": rng.integers(1, 3, 9),
        "age_level": rng.integers(0, 5, 9),
        "pvalue_level": rng.integers(1, 4, 9),
        "shopping_level": rng.integers(1, 4, 9),
        "occupation": rng.integers(0, 2, 9),
        "new_user_class_level": rng.integers(1, 5, 9),
    })
    items = pd.DataFrame({
        "adgroup_id": np.arange(1, 5),
        "cate_id": rng.integers(1, 10, 4),
        "campaign_id": rng.integers(1, 10, 4),
        "customer": rng.integers(1, 10, 4),
        "brand": rng.integers(1, 10, 4),
        "price": rng.random(4) * 100,
    })
    raw_csv = str(tmp_path / "raw_sample.csv")
    user_csv = str(tmp_path / "user_profile.csv")
    item_csv = str(tmp_path / "ad_feature.csv")
    h5 = str(tmp_path / "alimama.h5")
    raw.to_csv(raw_csv, index=False)
    users.to_csv(user_csv, index=False)
    items.to_csv(item_csv, index=False)

    alimama.preprocess(raw_csv, user_csv, item_csv, h5)
    data = alimama.load(h5)
    assert set(data["pid"]) <= {0, 1}
    assert data["price"].dtype.kind == "f"
    train, test = alimama.split_by_time(data)
    assert len(train["clk"]) == 30 and len(test["clk"]) == 10


def test_sharded_iterator_covers_all_rows():
    n, bs = 103, 16
    data = {"sparse": np.arange(n * 2).reshape(n, 2)}
    labels = np.arange(n).astype(np.float32)
    # 2 hosts must jointly cover every row exactly once
    seen = []
    for host in range(2):
        it = loader.ShardedBatchIterator(data, labels, bs, shuffle=True,
                                         seed=3, host_id=host, num_hosts=2)
        for batch, y, w in it.epoch(0):
            seen.extend(y[w > 0].tolist())
    assert sorted(seen) == list(range(n))


def test_prefetcher_order():
    items = list(range(10))
    pf = loader.Prefetcher(iter(items), depth=2, transform=lambda x: x * 2)
    assert list(pf) == [x * 2 for x in items]


def test_cli_synthetic_end_to_end(tmp_path):
    """Full CLI run: synthetic data, DeepFM, 1 epoch, CSV row written."""
    from satrans_tpu.cli import main as cli

    auc = cli.main([
        "--data_name", "synthetic", "--model_name", "DeepFM",
        "--embedding_dim", "8", "--learning_rate", "0.01",
        "--synthetic_rows", "4000", "--batch_size", "512",
        "--results_dir", str(tmp_path), "--seed", "7",
    ])
    assert 0.4 < auc <= 1.0
    csv = tmp_path / "synthetic_results.csv"
    assert csv.exists()
    row = csv.read_text().strip()
    # config,overall,perdomain...,loss
    assert "DeepFM_8_0.01_7_domain_None" in row
    assert len(row.split(",")) == 1 + 1 + 3 + 1  # cfg + overall + 3 domains + loss


def test_cli_satrans_synthetic(tmp_path):
    from satrans_tpu.cli import main as cli

    auc = cli.main([
        "--data_name", "synthetic", "--model_name", "SATrans",
        "--embedding_dim", "8", "--learning_rate", "0.01",
        "--domain_att_layer_num", "1", "--att_head_num", "2",
        "--meta_mode", "QK", "--synthetic_rows", "3000",
        "--batch_size", "512", "--results_dir", str(tmp_path),
        "--scan_steps", "2",
    ])
    assert 0.4 < auc <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import DeepFM
    from satrans_tpu.train import Trainer, checkpoint

    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=600, num_sparse=4, vocab=30)
    tr = Trainer(DeepFM(layout=layout), seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    pred1 = tr.predict(x, batch_size=128)
    checkpoint.save(str(tmp_path / "ckpt"), tr)

    tr2 = Trainer(DeepFM(layout=layout), seed=99)
    tr2.compile(learning_rate=0.01)
    tr2._strategy = tr2._resolve_strategy(x)
    checkpoint.restore(str(tmp_path / "ckpt"), tr2)
    tr2._build_steps()
    pred2 = tr2.predict(x, batch_size=128)
    np.testing.assert_allclose(pred1, pred2, atol=1e-6)
    # resume training continues without error
    tr2.fit(x, y, batch_size=128, epochs=1, verbose=0)


def test_periodic_checkpoint_and_resume(tmp_path):
    """Crash-recovery: periodic in-epoch checkpoints + resume restores state."""
    import jax
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import DeepFM
    from satrans_tpu.train import Trainer

    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=800, num_sparse=4, vocab=30)
    ckpt = str(tmp_path / "periodic")

    tr = Trainer(DeepFM(layout=layout), seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0,
           checkpoint_path=ckpt, checkpoint_every=2)
    pred1 = tr.predict(x, batch_size=128)

    # a "crashed" trainer resumes from the periodic checkpoint
    tr2 = Trainer(DeepFM(layout=layout), seed=99)
    tr2.compile(learning_rate=0.01)
    tr2.fit(x, y, batch_size=128, epochs=1, verbose=0, shuffle=False,
            steps_per_epoch=1, checkpoint_path=ckpt, resume=True)
    # it trained 1 more step from the checkpoint - params finite & usable
    pred2 = tr2.predict(x, batch_size=128)
    assert np.isfinite(pred2).all()


def test_validation_and_early_stopping(capsys):
    """Mid-epoch validation + History + EarlyStopping wiring."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import DeepFM
    from satrans_tpu.train import Trainer
    from satrans_tpu.train.callbacks import EarlyStopping

    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=1200, num_sparse=4, vocab=30)
    xv = {k: v[1000:] for k, v in x.items()}
    xt = {k: v[:1000] for k, v in x.items()}

    tr = Trainer(DeepFM(layout=layout), seed=0)
    tr.compile(learning_rate=0.01)
    es = EarlyStopping(monitor="val_auc", patience=0, mode="max")
    h = tr.fit(xt, y[:1000], batch_size=256, epochs=6, verbose=1,
               validation_data=(xv, y[1000:]), valid_cnt_per_epoch=2,
               callbacks=[es])
    out = capsys.readouterr().out
    assert "val_auc" in out  # mid-epoch validation printed
    assert "val_auc" in h.history
    # early stopping halted before all 6 epochs OR ran all with improvement
    assert len(h.epoch) <= 6


def test_shared_embedding_tables():
    """Fields with the same embedding_name share one table in the bank."""
    import jax
    import jax.numpy as jnp
    from satrans_tpu import embeddings
    from satrans_tpu.features import FeatureLayout, SparseFeature

    cols = [SparseFeature("a", 50, 8, embedding_name="shared"),
            SparseFeature("b", 50, 8, embedding_name="shared"),
            SparseFeature("c", 30, 8)]
    layout = FeatureLayout(cols)
    assert layout.total_rows == 50 + 30  # shared table counted once
    assert layout.sparse_field_offsets[0] == layout.sparse_field_offsets[1]
    params = embeddings.bank_init(jax.random.PRNGKey(0), layout)
    ids = np.array([[7, 7, 3]], dtype=np.int32)
    emb = np.asarray(embeddings.lookup_sparse(params, layout,
                                              jnp.asarray(ids)))
    # same id through the shared table -> identical vectors
    np.testing.assert_array_equal(emb[0, 0], emb[0, 1])
    # vocab mismatch on a shared name is rejected
    with pytest.raises(ValueError):
        FeatureLayout([SparseFeature("a", 50, 8, embedding_name="s"),
                       SparseFeature("b", 40, 8, embedding_name="s")])


def test_cli_multi_scenario_columns(tmp_path):
    """--domain_col a-b drives SATrans' multi-column scenario path."""
    from satrans_tpu.cli import main as cli

    auc = cli.main([
        "--data_name", "synthetic", "--model_name", "SATrans",
        "--embedding_dim", "8", "--learning_rate", "0.01",
        "--domain_att_layer_num", "1", "--att_head_num", "2",
        "--meta_mode", "QK", "--synthetic_rows", "2000",
        "--batch_size", "512", "--domain_col", "domain-f0",
        "--results_dir", str(tmp_path)])
    assert 0.3 < auc <= 1.0


def test_aliccp_history_underscore_names(tmp_path):
    """Writer accepts '109_14'-style keys; reader resolves both spellings."""
    h5 = str(tmp_path / "alicpp.h5")
    frame = pd.DataFrame({"click": [0, 1, 0], "101": [1, 2, 3],
                          "301": [1, 2, 3]})
    hist = aliccp.history_feature_frame(
        aliccp.topk_edges([1, 2, 3], [5, 6, 7], [1.0, 1.0, 1.0], k=2),
        k=2, col="109_14")
    aliccp.build_h5(frame, frame, h5, history={"109_14": hist}, k=2)
    loaded = aliccp.load_split(h5, "ctr_train", ["click", "10914"], k=2)
    assert loaded["10914"].shape == (3, 2)
    loaded2 = aliccp.load_split(h5, "ctr_train", ["109_14"], k=2)
    assert loaded2["109_14"].shape == (3, 2)


def test_native_gather_columns_rejects_wide_dtypes():
    from satrans_tpu import native
    with pytest.raises(TypeError):
        native.gather_columns([np.arange(5, dtype=np.int64)],
                              np.array([0, 1]), dtype=np.int64)


def test_io_aliases(tmp_path):
    import pandas as pd
    from satrans_tpu.utils import df2dict
    h5 = str(tmp_path / "t.h5")
    io.save_dict_h5(h5, {"a": np.arange(5), "b": np.ones(5)})
    df = io.loadh52df(h5)
    assert list(sorted(df.columns)) == ["a", "b"]
    d = df2dict(df)
    np.testing.assert_array_equal(d["a"], np.arange(5))
    names = io.list_h5(h5)
    assert ("a", (5,)) in names
    io.dump_npy(np.arange(3), str(tmp_path / "x.npy"))
    np.testing.assert_array_equal(io.load_npy(str(tmp_path / "x.npy")),
                                  np.arange(3))


def _write_common_features(path, rows):
    """rows: list of (line_id, {field: (value, score)}) in the raw AliCCP
    common-features packing (key\\x02value\\x03score joined by \\x01)."""
    with open(path, "w") as f:
        for line_id, feats in rows:
            kvs = "\x01".join(f"{k}\x02{v}\x03{s}"
                              for k, (v, s) in feats.items())
            f.write(f"{line_id},{len(feats)},{kvs}\n")


def test_aliccp_parse_common_features(tmp_path):
    p = str(tmp_path / "common_features_train.csv")
    _write_common_features(p, [
        ("a1", {"101": (7, 1.0), "109_14": (500, 0.9), "121": (3, 1.0)}),
        ("a2", {"109_14": (501, 0.5)}),            # no uid -> skipped
        ("a3", {"101": (8, 1.0), "110_14": (900, 0.2)}),
    ])
    acc = aliccp.parse_common_features(p)
    assert acc["109_14"] == ([7], [500], [0.9])
    assert acc["110_14"] == ([8], [900], [0.2])
    assert acc["150_14"] == ([], [], [])


def test_aliccp_raw_pipeline_end_to_end(tmp_path):
    """preprocess_raw runs from the reference's raw inputs through the
    edge-dump intermediates (aliccp_dataset_processing.py:49-143) to the
    final ctr_train/ctr_test schema."""
    h5 = str(tmp_path / "alicpp.h5")
    common_tr = str(tmp_path / "common_features_train.csv")
    common_te = str(tmp_path / "common_features_test.csv")
    # raw history fids live in a global range; the pipeline must remap them
    # to 1-based local ids using the min over train+test (ref :70-82)
    _write_common_features(common_tr, [
        ("a1", {"101": (1, 1.0), "109_14": (1000, 0.9)}),
        ("a2", {"101": (1, 1.0), "109_14": (1002, 0.5)}),
        ("a3", {"101": (2, 1.0), "109_14": (1001, 0.7)}),
    ])
    _write_common_features(common_te, [
        # uid 2 already in train -> filtered from merged; uid 3 is new
        ("b1", {"101": (2, 1.0), "109_14": (1005, 0.8)}),
        ("b2", {"101": (3, 1.0), "109_14": (1003, 0.4)}),
    ])
    rng = np.random.default_rng(0)
    n = 12
    cols = {"click": rng.integers(1, 3, n), "purchase": np.ones(n, int)}
    for c in aliccp.SPARSE_FEATURES:
        cols[c] = aliccp.MIN_V[c] + rng.integers(0, 3, n)
    cols["101"] = np.array([1, 2, 3, 4] * 3) + aliccp.MIN_V["101"] - 1
    sk_tr = str(tmp_path / "skeleton_train.csv")
    sk_te = str(tmp_path / "skeleton_test.csv")
    pd.DataFrame(cols).to_csv(sk_tr, index=False)
    pd.DataFrame(cols).to_csv(sk_te, index=False)

    train_df, test_df = aliccp.preprocess_raw(sk_tr, sk_te, common_tr,
                                              common_te, h5, k=5)

    # intermediates: remapped [3, N] dumps and top-k edge lists exist
    dump = io.load_h5(h5, "101_10914/train")
    assert dump.shape == (3, 3)
    # fids remapped 1-based over train+test: min raw fid is 1000
    assert sorted(dump[1].tolist()) == [1, 2, 3]
    top5_tr = io.load_h5(h5, "101_10914/top5_train")
    assert top5_tr.shape[0] == 3
    merged = io.load_h5(h5, "101_10914/top5_merged")
    # train uids {1,2} + only the unseen test uid 3
    assert sorted(set(merged[:, 0].astype(int))) == [1, 2, 3]
    # attribute edge lists (ref :187-206)
    assert io.load_h5(h5, "101_121/merged").shape[0] == 2
    assert io.load_h5(h5, "205_206/merged").shape[0] == 2

    # final schema readable through the reference reader contract, with
    # per-user history: uid 1's top-5 = fids [1, 3] by score desc, 0-padded
    loaded = aliccp.load_split(h5, "ctr_train", ["click", "101", "10914"],
                               k=5)
    assert loaded["10914"].shape == (n, 5)
    uid1_rows = loaded["10914"][loaded["101"] == 1]
    assert uid1_rows[0].tolist() == [1, 3, 0, 0, 0]
    # uid 4 has no history -> zero tuple
    uid4_rows = loaded["10914"][loaded["101"] == 4]
    assert uid4_rows[0].tolist() == [0, 0, 0, 0, 0]
    # test split uses its own (not train's) history edges
    lte = aliccp.load_split(h5, "ctr_test", ["101", "10914"], k=5)
    uid2_te = lte["10914"][lte["101"] == 2]
    assert uid2_te[0].tolist() == [6, 0, 0, 0, 0]


def test_checkpoint_restore_pre_meta_format(tmp_path):
    """Checkpoints written before the 'meta' group existed (round 1) must
    still restore (the offset falls back to the model's config default)."""
    import orbax.checkpoint as ocp

    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import DeepFM
    from satrans_tpu.train import Trainer, checkpoint

    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=300, num_sparse=4, vocab=30)
    tr = Trainer(DeepFM(layout=layout), seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    pred1 = tr.predict(x, batch_size=128)

    # write the ROUND-1 payload shape: no 'meta' group
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(tmp_path / "old"), {"params": tr.params,
                                       "opt_state": tr.opt_state,
                                       "state": tr.state}, force=True)
    ckptr.wait_until_finished()

    tr2 = Trainer(DeepFM(layout=layout), seed=99)
    tr2.compile(learning_rate=0.01)
    tr2._strategy = tr2._resolve_strategy(x)
    checkpoint.restore(str(tmp_path / "old"), tr2)
    tr2._build_steps()
    np.testing.assert_allclose(pred1, tr2.predict(x, batch_size=128),
                               atol=1e-6)
