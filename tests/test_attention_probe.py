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
