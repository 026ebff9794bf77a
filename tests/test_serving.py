"""Serving predictor tests."""

import numpy as np

from satrans_tpu import serving
from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
from satrans_tpu.features import FeatureLayout
from satrans_tpu.models import MMOE, SATrans
from satrans_tpu.train import Trainer


def _trained(model_cls=SATrans, **kw):
    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=500, num_sparse=4, vocab=30)
    if model_cls is SATrans:
        model = SATrans(layout=layout, domain_cols=["domain"],
                        num_domains_list=[3], domain_att_layer_num=1,
                        att_head_num=2, meta_dnn_hidden_units=(16, 8))
        tr = Trainer(model, seed=0)
        tr.compile(learning_rate=0.01)
    else:
        model = MMOE(layout=layout, num_tasks=3, domain_col="domain", **kw)
        tr = Trainer(model, seed=0)
        tr.compile(learning_rate=0.01, loss=["binary_crossentropy"] * 3)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    return tr, x, y


def test_predictor_matches_trainer_predict():
    tr, x, y = _trained()
    p = serving.Predictor.from_trainer(tr, batch_size=128).warmup()
    got = p(x)
    want = tr.predict(x, batch_size=128)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_predictor_aot_compile():
    tr, x, y = _trained()
    p = serving.Predictor.from_trainer(tr, batch_size=128).aot_compile()
    got = p(x)
    np.testing.assert_allclose(got, tr.predict(x, batch_size=128), atol=1e-6)


def test_predictor_mtl_routes():
    tr, x, y = _trained(MMOE)
    p = serving.Predictor.from_trainer(tr, batch_size=128)
    got = p(x)
    assert got.shape == (500,)
    np.testing.assert_allclose(got, tr.predict(x, batch_size=128), atol=1e-6)


def test_serving_save_load(tmp_path):
    tr, x, y = _trained()
    serving.save(str(tmp_path / "m"), tr)
    p = serving.load(str(tmp_path / "m"), tr.model, batch_size=128)
    np.testing.assert_allclose(p(x), tr.predict(x, batch_size=128),
                               atol=1e-6)


def test_serving_restores_fit_learned_domain_offset(tmp_path):
    """ADVICE r1 (medium): 0-based domain ids + a fresh model config (whose
    dataclass default offset is 1) must still route correctly after load -
    the fit-learned domain_id_offset travels with the checkpoint."""
    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=500, num_sparse=4, vocab=30)
    x = dict(x)
    x["domain"] = x["domain"] - 1  # 0-based scenario ids (Alimama pid style)
    model = MMOE(layout=layout, num_tasks=3, domain_col="domain")
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01, loss=["binary_crossentropy"] * 3)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    assert model.domain_id_offset == 0
    serving.save(str(tmp_path / "m"), tr)

    fresh = MMOE(layout=layout, num_tasks=3, domain_col="domain")
    assert fresh.domain_id_offset == 1  # the config default that was wrong
    p = serving.load(str(tmp_path / "m"), fresh, batch_size=128)
    assert fresh.domain_id_offset == 0
    np.testing.assert_allclose(p(x), tr.predict(x, batch_size=128),
                               atol=1e-6)


def test_predictor_pipelined_matches_serial():
    """The overlapped (threaded staging) path must return bit-identical
    scores to the serial path, including the padded tail batch."""
    tr, x, y = _trained()
    p = serving.Predictor.from_trainer(tr, batch_size=128)
    want = p(x, pipeline_depth=1)
    for depth in (2, 4):
        np.testing.assert_array_equal(p(x, pipeline_depth=depth), want)
    # constructor-default pipeline depth (the host-attached deployment
    # configuration) drives the threaded path without a per-call override
    p3 = serving.Predictor(tr.model, tr.params, tr.state, batch_size=128,
                           pipeline_depth=3)
    assert p3.pipeline_depth == 3
    np.testing.assert_array_equal(p3(x), want)
