"""showattn / instattn probe tests."""

import numpy as np

from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
from satrans_tpu.features import FeatureLayout
from satrans_tpu.models import SATrans
from satrans_tpu.train import Trainer
from satrans_tpu.train.attention_probe import (dump_instance_attention,
                                               predict_with_attention)


def _trainer():
    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=2,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8))
    x, y = synthetic_data(n=300, num_sparse=4, vocab=30)
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    return tr, x, y


def test_showattn_shapes_and_normalization():
    tr, x, y = _trainer()
    preds, stats = predict_with_attention(tr, x, y, batch_size=128)
    assert preds.shape == (300,)
    assert len(stats) == 2  # layers
    assert len(stats[0]) == 3  # domains
    for d in range(3):
        m = stats[0][d]["all"]
        assert m.shape == (2, 4 + 1, 4 + 1)  # [H, F, F] (4 feats + domain)
        # rows of mean attention sum to ~1
        np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-4)
    # pos/neg partition: count-weighted sum equals 'all' sum
    pos_n = (np.asarray(y) == 1).sum()
    assert pos_n > 0


def test_instattn_dumps_files(tmp_path):
    tr, x, y = _trainer()
    prefix = str(tmp_path / "inst_attn")
    domains = dump_instance_attention(tr, x, batch_size=128, threshold=0.05,
                                      out_prefix=prefix, max_instances=200)
    assert domains  # at least one domain file
    for d in domains:
        lines = open(f"{prefix}_{d}.txt").read().strip().splitlines()
        assert lines
        parts = lines[0].split("\t")
        assert len(parts) == 5  # instance, layer, i, j, score
        assert float(parts[4]) > 0.05


def test_visual_id_lists_parity():
    """The hard-coded instance lists match the reference tables
    (submodules.py:243-310): 312 ids paired with 312 scenario ids."""
    from satrans_tpu.train.attention_probe import (ALIMAMA_DOMAIN_VISUAL_IDS,
                                                   ALIMAMA_TEST_VISUAL_IDS)
    assert len(ALIMAMA_TEST_VISUAL_IDS) == len(ALIMAMA_DOMAIN_VISUAL_IDS)
    assert len(ALIMAMA_TEST_VISUAL_IDS) == 312
    assert set(ALIMAMA_DOMAIN_VISUAL_IDS) == {1, 2, 3}
    # spot-check the corners against the reference table
    assert ALIMAMA_TEST_VISUAL_IDS[0] == 1453289
    assert ALIMAMA_TEST_VISUAL_IDS[-1] == 14245248
    assert ALIMAMA_DOMAIN_VISUAL_IDS[:5] == [2, 1, 2, 1, 2]


def test_collect_visual_instances():
    from satrans_tpu.train.attention_probe import collect_visual_instances
    tr, x, y = _trainer()
    maps = collect_visual_instances(tr, x, ids=[3, 17, 250, 10_000],
                                    batch_size=128)
    assert sorted(maps) == [3, 17, 250]  # 10_000 beyond the data
    for m in maps.values():
        assert m.shape == (2, 5, 5)  # [H, F, F]
        np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-4)


def test_instattn_reference_format(tmp_path):
    """3-line records in the reference's exact content format
    (meta_basemodel.py:460-499)."""
    from satrans_tpu.features import SparseFeature
    from satrans_tpu.train.attention_probe import \
        dump_instance_attention_reference

    # 16-field layout mimicking alimama sparseprice ordering: index 5 gender,
    # 7 pvalue, 8 shopping, 15 price
    rng = np.random.default_rng(0)
    n = 200
    vocabs = [50] * 16
    vocabs[15] = 20000
    cols = [SparseFeature(f"c{i}", vocabs[i] + 2, 8) for i in range(16)]
    cols[2] = SparseFeature("pid", 4, 8)
    layout = FeatureLayout(cols)
    x = {c.name: rng.integers(1, min(c.vocab - 1, 50), n) for c in cols}
    x["c15"] = rng.integers(9000, 20000, n)  # price ids, many >10000/12000
    x["c7"] = np.full(n, 3)                  # pvalue gate
    x["pid"] = rng.integers(1, 3, n)
    y = rng.integers(0, 2, n).astype(np.float32)
    model = SATrans(layout=layout, domain_cols=["pid"], num_domains_list=[2],
                    domain_att_layer_num=1, att_head_num=2,
                    meta_dnn_hidden_units=(16, 8))
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)

    classes = np.arange(30000) * 2  # fake label-encoder classes
    path = dump_instance_attention_reference(
        tr, x, y, flag="instattn_sparseprice", classes_=classes,
        batch_size=64, threshold=0.0, out_dir=str(tmp_path))
    lines = open(path).read().splitlines()
    assert lines and len(lines) % 3 == 0
    header, scores, inst = lines[0], lines[1], lines[2]
    assert header.startswith("score ")
    assert ",label " in header and ",pvalue 3,price " in header
    # price decoded through classes_
    price = int(header.split("price ")[1])
    assert price % 2 == 0
    f = 16
    assert len(scores.split(",")) == f * f + 1  # trailing comma
    assert scores.endswith(",")
    vals = inst.split(",")
    assert len(vals) == f + 1 and inst.endswith(",")
    assert float(vals[7]) == 3.0


def test_predict_recomputes_domain_offset():
    """Engine C re-learns head routing from the predict data
    (reference mtl_basemodel.py:352)."""
    from satrans_tpu.models import MMOE
    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=300, num_sparse=4, vocab=30)
    model = MMOE(layout=layout, num_tasks=3, domain_col="domain")
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01, loss=["binary_crossentropy"] * 3)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)  # domains 1..3
    base = tr.predict(x, batch_size=128)
    assert tr._strategy.offset == 1
    # 0-based domain ids: the offset is re-learned from the PREDICT data and
    # each sample routes to the head its (id - new min) selects.  (Values
    # differ from `base` because the domain column is also an embedded
    # feature - same as the reference.)
    import jax.numpy as jnp
    x0 = dict(x)
    x0["domain"] = x["domain"] - 1
    shifted = tr.predict(x0, batch_size=128)
    assert tr._strategy.offset == 0
    batch = {k: jnp.asarray(v)
             for k, v in layout.batch_from_dict(x0).items()}
    heads, _, _ = model.apply(tr.params, tr.state, batch, train=False)
    manual = np.asarray(heads)[np.arange(len(shifted)), x0["domain"]]
    np.testing.assert_allclose(shifted, manual, atol=1e-6)
    # and predicting the original again re-learns offset 1, bit-equal
    again = tr.predict(x, batch_size=128)
    np.testing.assert_allclose(again, base, atol=1e-6)
    assert tr._strategy.offset == 1
