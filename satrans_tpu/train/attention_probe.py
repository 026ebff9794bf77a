"""Attention inspection probes.

Reimplements the reference's ``showattn`` / ``instattn`` instrumentation
(meta_basemodel.py:421-517):

* ``showattn``: during prediction, accumulate each layer's attention maps
  into per-(layer, domain, label-class) means - the paper's attention
  visualizations.  The reference pulls every batch's scores to CPU; here the
  (layer, domain, class) sums accumulate on device and transfer once.
* ``instattn``: dump per-instance (field_i, field_j, score) triples whose
  attention exceeds a threshold to ``inst_attn_{domain}.txt``
  (meta_basemodel.py:460-499).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def predict_with_attention(trainer, x: dict, y, *, batch_size: int = 4096,
                           num_domains: int | None = None):
    """Returns (preds, stats) where ``stats[layer][domain]`` has 'pos'/'neg'/
    'all' mean attention maps ``[H, F, F]`` (head-major like the reference's
    ``normalized_att_scores``)."""
    model = trainer.model
    layout = trainer.layout
    domain_col = model.domain_cols[0]
    dcol = layout.sparse_index(domain_col)
    if num_domains is None:
        num_domains = int(getattr(model, "num_domains",
                                  model.num_domains_list[0]))

    data = layout.batch_from_dict(x)
    labels = np.asarray(y).reshape(-1)
    n = len(labels)
    bias = int(data["sparse"][:, dcol].min())  # meta_basemodel.py:438-441

    @jax.jit
    def eval_step(params, state, batch, yb):
        pred, _, _, scores = model.apply(params, state, batch, train=False,
                                         return_scores=True)
        ids = batch["sparse"][:, dcol]
        dom_onehot = jax.nn.one_hot(ids - bias, num_domains)  # [B, D]
        pos = (yb == 1).astype(jnp.float32)
        out_sums = []
        for s in scores:  # each [B, H, F, F]
            layer_sums = {}
            for name, w in (("pos", dom_onehot * pos[:, None]),
                            ("neg", dom_onehot * (1 - pos)[:, None]),
                            ("all", dom_onehot)):
                layer_sums[name] = jnp.einsum("bd,bhij->dhij", w, s)
            out_sums.append(layer_sums)
        counts = {"pos": jnp.sum(dom_onehot * pos[:, None], axis=0),
                  "neg": jnp.sum(dom_onehot * (1 - pos)[:, None], axis=0),
                  "all": jnp.sum(dom_onehot, axis=0)}
        return pred, out_sums, counts

    trainer._ensure_initialized()
    preds = []
    acc_sums = None
    acc_counts = None
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        bsz = end - start
        batch_np = {k: trainer._pad(v[start:end], batch_size)
                    for k, v in data.items()}
        yb = trainer._pad(labels[start:end], batch_size)
        # pad rows have domain id 0 -> one_hot(0-bias) underflows to no bucket
        # when bias>=1; for bias==0 mask them by pushing ids out of range.
        if bias == 0 and bsz < batch_size:
            batch_np["sparse"] = batch_np["sparse"].copy()
            batch_np["sparse"][bsz:, dcol] = num_domains + 1
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        pred, sums, counts = eval_step(trainer.params, trainer.state, batch,
                                       jnp.asarray(yb))
        preds.append(np.asarray(pred)[:bsz])
        if acc_sums is None:
            acc_sums, acc_counts = sums, counts
        else:
            acc_sums = jax.tree.map(jnp.add, acc_sums, sums)
            acc_counts = jax.tree.map(jnp.add, acc_counts, counts)

    acc_sums = jax.device_get(acc_sums)
    acc_counts = jax.device_get(acc_counts)
    stats = []
    for layer_sums in acc_sums:
        per_layer = []
        for d in range(num_domains):
            per_layer.append({
                name: layer_sums[name][d]
                / max(float(acc_counts[name][d]), 1.0)
                for name in ("pos", "neg", "all")})
        stats.append(per_layer)
    return np.concatenate(preds).astype("float64"), stats


def dump_instance_attention(trainer, x: dict, *, batch_size: int = 4096,
                            threshold: float = 0.2, out_prefix: str =
                            "inst_attn", max_instances: int = 1000):
    """``instattn``: per instance, write high-attention (i, j, score) triples
    to ``{out_prefix}_{domain}.txt`` (meta_basemodel.py:460-499)."""
    model = trainer.model
    layout = trainer.layout
    dcol = layout.sparse_index(model.domain_cols[0])
    data = layout.batch_from_dict(x)
    n = min(len(next(iter(data.values()))), max_instances)

    @jax.jit
    def eval_step(params, state, batch):
        pred, _, _, scores = model.apply(params, state, batch, train=False,
                                         return_scores=True)
        return pred, jnp.stack([jnp.mean(s, axis=1) for s in scores])

    files = {}
    try:
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            bsz = end - start
            batch_np = {k: trainer._pad(v[start:end], batch_size)
                        for k, v in data.items()}
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            pred, scores = eval_step(trainer.params, trainer.state, batch)
            scores = np.asarray(scores)[:, :bsz]  # [L, b, F, F]
            doms = batch_np["sparse"][:bsz, dcol]
            for b in range(bsz):
                d = int(doms[b])
                if d not in files:
                    files[d] = open(f"{out_prefix}_{d}.txt", "w")
                f = files[d]
                for layer in range(scores.shape[0]):
                    ii, jj = np.where(scores[layer, b] > threshold)
                    for i, j in zip(ii, jj):
                        f.write(f"{start + b}\t{layer}\t{i}\t{j}\t"
                                f"{scores[layer, b, i, j]:.4f}\n")
    finally:
        for f in files.values():
            f.close()
    return sorted(files)
