"""Star_Net (STAR: star topology multi-domain network).

Reimplements reference models/star.py:15-181:

* per-domain DNN whose effective layer weights are ``domain_w * shared_w``
  (elementwise) and biases ``domain_b + shared_b`` (star.py:156-169)
* per-domain partitioned BatchNorm (``MDR_BatchNorm``) whose affine is
  modulated by shared params: ``weight*shared_weight`` / ``bias+shared_bias``
  (submodules.py:107-175); each domain keeps its own running stats
* per-domain output linears fused the same way (star.py:167-169)
* optional ``usetrans`` self-attention stack before the DNNs (star.py:70-73)

TPU-first redesign of the routing: the reference boolean-mask-routes the
batch through D sequential per-domain subnets (star.py:147-170) - dynamic
shapes, D kernel launches over subsets.  Here domain weights are STACKED
``[D, in, out]`` tensors; every example is pushed through all D branches as
big static GEMMs and the result selected with a one-hot - identical math
(verified against a per-domain numpy oracle in tests), static shapes, MXU
friendly.  BatchNorm moments per domain use 0/1-masked moments over the full
batch (== moments of the subset).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import embeddings
from ..features import FeatureLayout
from ..nn import attention, core, initializers as init
from .common import combined_dnn_input


@dataclasses.dataclass
class StarNet:
    # one embed_fields(p["emb"]) per apply -> sparse bank-update eligible
    # (train/bank_optimizer.py)
    standard_bank_access = True

    layout: FeatureLayout
    domain_col: str = ""
    num_domains: int = 3
    domain_id_as_feature: bool = True
    dnn_hidden_units: Sequence[int] = (256, 128)
    use_domain_dnn: bool = True
    use_domain_bn: bool = True
    att_layer_num: int = 3
    flag: str = ""
    seed: int = 1024
    task: str = "binary"
    init_std: float = 1e-4
    l2_reg_embedding: float = 1e-5
    dnn_dropout: float = 0.0
    domain_id_offset: int = 1  # learned from data by the Trainer
    num_tasks: int = 1

    def __post_init__(self):
        self.embedding_dim = self.layout.embedding_dim
        self.use_trans = "usetrans" in self.flag
        self.domain_cols = [self.domain_col]
        if not self.domain_id_as_feature:
            raise NotImplementedError(
                "main.py always passes domain_id_as_feature=True (main.py:276)")
        self.input_dim = self.layout.input_dim()

    def set_domain_offset(self, offset: int):
        self.domain_id_offset = int(offset)

    # ------------------------------------------------------------------
    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        D = self.num_domains
        # no first-order linear model: the reference's STAR forward starts
        # from logit=0 and never reads it (star.py:126); keeping it would
        # cost ~50MB of dead Adam state on AliCCP-sized vocabs.
        p = {"emb": embeddings.bank_init(next(ks), self.layout,
                                         init_std=self.init_std)}
        state = {}
        if self.use_trans:
            p["int_layers"] = [
                attention.self_attention_init(next(ks), self.embedding_dim)
                for _ in range(self.att_layer_num)]
        dims = [self.input_dim] + list(self.dnn_hidden_units)
        if self.use_domain_dnn:
            p["shared_bn_scale"] = jnp.ones((self.input_dim,))
            p["shared_bn_bias"] = jnp.zeros((self.input_dim,))
            if self.use_domain_bn:
                p["bn_scale"] = jnp.ones((D, self.input_dim))
                p["bn_bias"] = jnp.zeros((D, self.input_dim))
                state["bn"] = [core.batch_norm_state(self.input_dim)
                               for _ in range(D)]
            # stacked per-domain DNN weights [D, in, out] + shared copies
            def dnn_stack(n):
                ws, bs = [], []
                for _ in range(n):
                    layer_w, layer_b = [], []
                    for i in range(len(dims) - 1):
                        kw, kb = jax.random.split(next(ks))
                        layer_w.append(init.normal(kw, (dims[i], dims[i + 1]),
                                                   self.init_std))
                        layer_b.append(init.torch_linear_bias(
                            kb, (dims[i + 1],), dims[i]))
                    ws.append(layer_w)
                    bs.append(layer_b)
                # -> per layer stacked [n, in, out] / [n, out]
                return ([jnp.stack([ws[d][i] for d in range(n)])
                         for i in range(len(dims) - 1)],
                        [jnp.stack([bs[d][i] for d in range(n)])
                         for i in range(len(dims) - 1)])

            p["domain_w"], p["domain_b"] = dnn_stack(D)
            sw, sb = dnn_stack(1)
            p["shared_w"] = [w[0] for w in sw]
            p["shared_b"] = [b[0] for b in sb]
            out_w, out_b = [], []
            for _ in range(D):
                lp = core.linear_init(next(ks), dims[-1], 1)
                out_w.append(lp["w"])
                out_b.append(lp["b"])
            p["domain_out_w"] = jnp.stack(out_w)
            p["domain_out_b"] = jnp.stack(out_b)
            shared_out = core.linear_init(next(ks), dims[-1], 1)
            p["shared_out_w"] = shared_out["w"]
            p["shared_out_b"] = shared_out["b"]
        else:
            p["dnn"] = core.mlp_init(next(ks), self.input_dim, dims[1:],
                                     init_std=self.init_std)
            p["dnn_out"] = core.linear_init(next(ks), dims[-1], 1,
                                            use_bias=False)
        return p, state

    # ------------------------------------------------------------------
    def apply(self, params, state, batch, *, train=False, rng=None):
        p = params
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = embeddings.embed_fields(p["emb"], self.layout, batch)
        ids = batch["sparse"][:, self.layout.sparse_index(self.domain_col)]
        D = self.num_domains

        if self.use_trans:
            att = x
            for i, lp in enumerate(p["int_layers"]):
                att = attention.self_attention_apply(
                    lp, att, 4, train=train, rng=jax.random.fold_in(rng, 50 + i))
            h = combined_dnn_input(att, batch.get("dense"),
                                   self.layout.dense_dim)
        else:
            h = combined_dnn_input(x, batch.get("dense"), self.layout.dense_dim)

        new_state = dict(state)
        if not self.use_domain_dnn:
            out = core.mlp_apply(p["dnn"], h, dropout_rate=self.dnn_dropout,
                                 train=train, rng=rng)
            logit = core.linear_apply(p["dnn_out"], out)
            return core.prediction(logit, self.task)[:, 0], new_state, \
                jnp.asarray(0.0)

        onehot = jax.nn.one_hot(ids - self.domain_id_offset, D, dtype=h.dtype)
        if self.use_domain_bn:
            ys = []
            new_bn = []
            for d in range(D):
                scale = p["bn_scale"][d] * p["shared_bn_scale"]
                bias = p["bn_bias"][d] + p["shared_bn_bias"]
                y_d, s_d = core.batch_norm_apply(
                    {"scale": scale, "bias": bias}, state["bn"][d], h,
                    train=train, scale=scale, bias=bias,
                    batch_weight=onehot[:, d] if train else None)
                ys.append(y_d)
                new_bn.append(s_d)
            h = jnp.einsum("dbi,bd->bi", jnp.stack(ys), onehot)
            new_state["bn"] = new_bn

        # fused per-domain DNN: W_eff[d] = domain_w[d] * shared_w
        for i, (dw, db) in enumerate(zip(p["domain_w"], p["domain_b"])):
            w_eff = dw * p["shared_w"][i][None]          # [D, in, out]
            b_eff = db + p["shared_b"][i][None]          # [D, out]
            hd = jnp.einsum("bi,dio->bdo", h, w_eff) + b_eff[None]
            hd = jax.nn.relu(hd)
            h = jnp.einsum("bdo,bd->bo", hd, onehot)
            h = core.dropout(h, self.dnn_dropout, train,
                             jax.random.fold_in(rng, i))

        w_out = p["domain_out_w"] * p["shared_out_w"][None]   # [D, hid, 1]
        b_out = p["domain_out_b"] + p["shared_out_b"][None]   # [D, 1]
        logit_d = jnp.einsum("bi,dio->bdo", h, w_out) + b_out[None]
        logit = jnp.einsum("bdo,bd->bo", logit_d, onehot)
        return core.prediction(logit, self.task)[:, 0], new_state, \
            jnp.asarray(0.0)

    # ------------------------------------------------------------------
    def reg_loss(self, p):
        loss = embeddings.l2_loss(p["emb"], self.l2_reg_embedding)
        # l2_reg_linear=0 upstream (star.py:46); dnn regs are l2_reg_dnn=0
        return loss
