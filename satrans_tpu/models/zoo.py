"""Single-task baseline zoo: WDL, DeepFM, DCN, xDeepFM, NFM, AFM, PNN,
AutoInt, FiBiNET, AdaSparse.

Each mirrors its reference counterpart (models/<name>.py) including the
reference's quirks that gate behavior:

* WDL's linear term is commented out upstream (wdl.py:69-70) -> DNN-only.
* AutoInt/PNN use no linear model (autoint.py:93, pnn.py:286).
* DeepFM honors ``nofm`` / ``nodnn`` ablation flags (deepfm.py:95, 100) and
  the ``metatrans`` hook (deepfm.py:91-93).
* AdaSparse prunes each DNN layer with pi = beta*sigmoid(alpha*W_p[x;dom]),
  hard-zeroed below epsilon (adasparse.py:88-106).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import embeddings
from ..nn import attention, core, initializers as init, interactions
from .common import ZooBase, combined_dnn_input


# ---------------------------------------------------------------------------
# WDL (reference wdl.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class WDL(ZooBase):
    dnn_hidden_units: Sequence[int] = (256, 128)
    dnn_dropout: float = 0.0
    l2_reg_dnn: float = 0.0

    def __post_init__(self):
        self._post()

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        p["dnn"] = core.mlp_init(next(ks), self.layout.input_dim(),
                                 list(self.dnn_hidden_units),
                                 init_std=self.init_std)
        p["dnn_out"] = core.linear_init(next(ks), self.dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        # linear logit intentionally omitted (reference wdl.py:69-70)
        dnn_in = combined_dnn_input(x, batch.get("dense"), self.layout.dense_dim)
        h = core.mlp_apply(params["dnn"], dnn_in, dropout_rate=self.dnn_dropout,
                           train=train, rng=rng)
        logit = core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        loss = self._base_reg(p)
        if self.l2_reg_dnn > 0:
            for layer in p["dnn"]["layers"]:
                loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(layer["w"]))
            loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(p["dnn_out"]["w"]))
        return loss


# ---------------------------------------------------------------------------
# DeepFM (reference deepfm.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DeepFM(ZooBase):
    dnn_hidden_units: Sequence[int] = (256, 128)
    dnn_dropout: float = 0.0
    l2_reg_dnn: float = 0.0
    use_fm: bool = True

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        p["dnn"] = core.mlp_init(next(ks), self.layout.input_dim(),
                                 list(self.dnn_hidden_units),
                                 init_std=self.init_std)
        p["dnn_out"] = core.linear_init(next(ks), self.dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        logit = embeddings.linear_model_apply(params["linear"], self.layout,
                                              batch)
        if "nofm" not in self.flag and self.use_fm:
            logit = logit + interactions.fm(x)
        if "nodnn" not in self.flag:
            dnn_in = combined_dnn_input(x, batch.get("dense"),
                                        self.layout.dense_dim)
            h = core.mlp_apply(params["dnn"], dnn_in,
                               dropout_rate=self.dnn_dropout, train=train,
                               rng=rng)
            logit = logit + core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        loss = self._base_reg(p)
        if self.l2_reg_dnn > 0:
            for layer in p["dnn"]["layers"]:
                loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(layer["w"]))
            loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(p["dnn_out"]["w"]))
        return loss


# ---------------------------------------------------------------------------
# DCN (reference dcn.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DCN(ZooBase):
    cross_num: int = 2
    cross_parameterization: str = "vector"
    dnn_hidden_units: Sequence[int] = (128, 128)
    dnn_dropout: float = 0.0
    l2_reg_dnn: float = 0.0
    l2_reg_cross: float = 1e-5

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        in_dim = self.layout.input_dim()
        p["dnn"] = core.mlp_init(next(ks), in_dim,
                                 list(self.dnn_hidden_units),
                                 init_std=self.init_std)
        p["cross"] = interactions.crossnet_init(next(ks), in_dim,
                                                self.cross_num,
                                                self.cross_parameterization)
        head_in = in_dim + self.dnn_hidden_units[-1] \
            if self.dnn_hidden_units and self.cross_num > 0 \
            else (self.dnn_hidden_units[-1] if self.dnn_hidden_units else in_dim)
        p["dnn_out"] = core.linear_init(next(ks), head_in, 1, use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        logit = embeddings.linear_model_apply(params["linear"], self.layout,
                                              batch)
        x = self._embed(params, batch, train=train, rng=rng)
        dnn_in = combined_dnn_input(x, batch.get("dense"), self.layout.dense_dim)
        parts = []
        if self.cross_num > 0:
            parts.append(interactions.crossnet_apply(
                params["cross"], dnn_in, self.cross_parameterization))
        if self.dnn_hidden_units:
            parts.insert(0, core.mlp_apply(params["dnn"], dnn_in,
                                           dropout_rate=self.dnn_dropout,
                                           train=train, rng=rng))
        # reference stacks (cross_out, deep_out) (dcn.py forward)
        stack = jnp.concatenate(parts[::-1], axis=-1) if len(parts) > 1 else parts[0]
        logit = logit + core.linear_apply(params["dnn_out"], stack)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        loss = self._base_reg(p)
        loss = loss + self.l2_reg_cross * jnp.sum(jnp.square(p["cross"]["kernels"]))
        if self.l2_reg_dnn > 0:
            for layer in p["dnn"]["layers"]:
                loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(layer["w"]))
        # dnn_linear weight registered with l2_reg_linear upstream (dcn.py)
        loss = loss + self.l2_reg_linear * jnp.sum(jnp.square(p["dnn_out"]["w"]))
        return loss


# ---------------------------------------------------------------------------
# xDeepFM (reference xdeepfm.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class XDeepFM(ZooBase):
    dnn_hidden_units: Sequence[int] = (256, 256)
    cin_layer_size: Sequence[int] = (256, 128)
    cin_split_half: bool = True
    cin_activation: str = "relu"
    dnn_dropout: float = 0.0
    l2_reg_dnn: float = 0.0
    l2_reg_cin: float = 0.0

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        if self.dnn_hidden_units:
            p["dnn"] = core.mlp_init(next(ks), self.layout.input_dim(),
                                     list(self.dnn_hidden_units),
                                     init_std=self.init_std)
            p["dnn_out"] = core.linear_init(next(ks),
                                            self.dnn_hidden_units[-1], 1,
                                            use_bias=False)
        if self.cin_layer_size:
            p["cin"] = interactions.cin_init(next(ks), self.layout.num_fields,
                                             self.cin_layer_size,
                                             self.cin_split_half)
            p["cin_out"] = core.linear_init(
                next(ks),
                interactions.cin_output_dim(self.cin_layer_size,
                                            self.cin_split_half),
                1, use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        logit = embeddings.linear_model_apply(params["linear"], self.layout,
                                              batch)
        if self.cin_layer_size:
            cin_out = interactions.cin_apply(params["cin"], x,
                                             self.cin_layer_size,
                                             self.cin_split_half,
                                             self.cin_activation)
            logit = logit + core.linear_apply(params["cin_out"], cin_out)
        if self.dnn_hidden_units:
            dnn_in = combined_dnn_input(x, batch.get("dense"),
                                        self.layout.dense_dim)
            h = core.mlp_apply(params["dnn"], dnn_in,
                               dropout_rate=self.dnn_dropout, train=train,
                               rng=rng)
            logit = logit + core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        loss = self._base_reg(p)
        if self.l2_reg_dnn > 0 and "dnn" in p:
            for layer in p["dnn"]["layers"]:
                loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(layer["w"]))
            loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(p["dnn_out"]["w"]))
        if self.l2_reg_cin > 0 and "cin" in p:
            for conv in p["cin"]["convs"]:
                loss = loss + self.l2_reg_cin * jnp.sum(jnp.square(conv["w"]))
        return loss


# ---------------------------------------------------------------------------
# NFM (reference nfm.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class NFM(ZooBase):
    dnn_hidden_units: Sequence[int] = (128, 128)
    dnn_dropout: float = 0.0
    bi_dropout: float = 0.0
    l2_reg_dnn: float = 0.0

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        in_dim = self.layout.dense_dim + self.layout.embedding_dim
        p["dnn"] = core.mlp_init(next(ks), in_dim,
                                 list(self.dnn_hidden_units),
                                 init_std=self.init_std)
        p["dnn_out"] = core.linear_init(next(ks), self.dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        logit = embeddings.linear_model_apply(params["linear"], self.layout,
                                              batch)
        bi = interactions.bi_interaction_pooling(x)  # [B,1,d]
        if self.bi_dropout > 0 and train:
            bi = core.dropout(bi, self.bi_dropout, train, rng)
        dnn_in = combined_dnn_input(bi, batch.get("dense"),
                                    self.layout.dense_dim)
        h = core.mlp_apply(params["dnn"], dnn_in, dropout_rate=self.dnn_dropout,
                           train=train, rng=rng)
        logit = logit + core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        return self._base_reg(p)


# ---------------------------------------------------------------------------
# AFM (reference afm.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AFM(ZooBase):
    use_attention: bool = True
    attention_factor: int = 8
    l2_reg_att: float = 1e-5
    afm_dropout: float = 0.0

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        if self.use_attention:
            p["afm"] = interactions.afm_init(next(ks), self.embedding_dim,
                                             self.attention_factor)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        logit = embeddings.linear_model_apply(params["linear"], self.layout,
                                              batch)
        if self.use_attention:
            logit = logit + interactions.afm_apply(
                params["afm"], x, dropout_rate=self.afm_dropout, train=train,
                rng=rng)
        else:
            logit = logit + interactions.fm(x)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        loss = self._base_reg(p)
        if "afm" in p:
            loss = loss + self.l2_reg_att * jnp.sum(jnp.square(p["afm"]["att_w"]))
        return loss


# ---------------------------------------------------------------------------
# PNN (reference pnn.py) - no linear model
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PNN(ZooBase):
    dnn_hidden_units: Sequence[int] = (128, 128)
    dnn_dropout: float = 0.0
    use_inner: bool = True
    use_outter: bool = False
    kernel_type: str = "mat"
    l2_reg_dnn: float = 0.0

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks, use_linear=False)
        f = self.layout.num_fields
        num_pairs = f * (f - 1) // 2
        product_dim = num_pairs * (int(self.use_inner) + int(self.use_outter))
        if self.use_outter:
            p["outer"] = interactions.outer_product_init(
                next(ks), f, self.embedding_dim, self.kernel_type)
        p["dnn"] = core.mlp_init(next(ks),
                                 product_dim + self.layout.input_dim(),
                                 list(self.dnn_hidden_units),
                                 init_std=self.init_std)
        p["dnn_out"] = core.linear_init(next(ks), self.dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        linear_signal = x.reshape(x.shape[0], -1)
        parts = [linear_signal]
        if self.use_inner:
            parts.append(interactions.inner_product(x))
        if self.use_outter:
            parts.append(interactions.outer_product_apply(
                params["outer"], x, self.kernel_type))
        product = jnp.concatenate(parts, axis=1)
        dnn_in = combined_dnn_input(product, batch.get("dense"),
                                    self.layout.dense_dim)
        h = core.mlp_apply(params["dnn"], dnn_in, dropout_rate=self.dnn_dropout,
                           train=train, rng=rng)
        logit = core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        return embeddings.l2_loss(p["emb"], self.l2_reg_embedding)


# ---------------------------------------------------------------------------
# AutoInt (reference autoint.py) - deepctr InteractingLayer stack
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AutoInt(ZooBase):
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
    dnn_hidden_units: Sequence[int] = (256, 128)
    dnn_dropout: float = 0.0
    l2_reg_dnn: float = 0.0

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "usemetatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 24))
        p = self._init_base(ks, use_linear=True)  # linear built but unused
        d = self.embedding_dim
        p["int_layers"] = [
            attention.interacting_init(next(ks), d, use_res=self.att_res)
            for _ in range(self.att_layer_num)]
        if self.dnn_hidden_units:
            p["dnn"] = core.mlp_init(next(ks), self.layout.input_dim(),
                                     list(self.dnn_hidden_units),
                                     init_std=self.init_std)
        f = self.layout.num_fields
        if self.dnn_hidden_units and self.att_layer_num > 0:
            head_in = self.dnn_hidden_units[-1] + f * d
        elif self.dnn_hidden_units:
            head_in = self.dnn_hidden_units[-1]
        else:
            head_in = f * d
        p["dnn_out"] = core.linear_init(next(ks), head_in, 1, use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        att = x
        for lp in params["int_layers"]:
            att = attention.interacting_apply(lp, att, self.att_head_num)
        att_flat = att.reshape(att.shape[0], -1)
        parts = []
        if self.att_layer_num > 0:
            parts.append(att_flat)
        if self.dnn_hidden_units:
            dnn_in = combined_dnn_input(x, batch.get("dense"),
                                        self.layout.dense_dim)
            parts.append(core.mlp_apply(params["dnn"], dnn_in,
                                        dropout_rate=self.dnn_dropout,
                                        train=train, rng=rng))
        stack = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        logit = core.linear_apply(params["dnn_out"], stack)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        loss = self._base_reg(p)
        if self.l2_reg_dnn > 0 and "dnn" in p:
            for layer in p["dnn"]["layers"]:
                loss = loss + self.l2_reg_dnn * jnp.sum(jnp.square(layer["w"]))
        return loss


# ---------------------------------------------------------------------------
# FiBiNET (reference fibinet.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FiBiNET(ZooBase):
    bilinear_type: str = "interaction"
    reduction_ratio: int = 3
    dnn_hidden_units: Sequence[int] = (128, 128)
    dnn_dropout: float = 0.0

    def __post_init__(self):
        self._post()
        self.use_meta = bool(self.domain_col) and "metatrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_base(ks)
        f = self.layout.num_fields
        d = self.embedding_dim
        p["senet"] = interactions.senet_init(next(ks), f, self.reduction_ratio)
        p["bilinear"] = interactions.bilinear_init(next(ks), f, d,
                                                   self.bilinear_type)
        # DNN input: F*(F-1)*d (two bilinear outputs) + dense
        # (reference fibinet.py:58-76 compute_input_dim override)
        in_dim = f * (f - 1) * d + self.layout.dense_dim
        p["dnn"] = core.mlp_init(next(ks), in_dim,
                                 list(self.dnn_hidden_units),
                                 init_std=self.init_std)
        p["dnn_out"] = core.linear_init(next(ks), self.dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        x = self._embed(params, batch, train=train, rng=rng)
        logit = embeddings.linear_model_apply(params["linear"], self.layout,
                                              batch)
        senet_out = interactions.senet_apply(params["senet"], x)
        b1 = interactions.bilinear_apply(params["bilinear"], senet_out,
                                         self.bilinear_type)
        b2 = interactions.bilinear_apply(params["bilinear"], x,
                                         self.bilinear_type)
        both = jnp.concatenate([b1, b2], axis=1)
        dnn_in = combined_dnn_input(both, batch.get("dense"),
                                    self.layout.dense_dim)
        h = core.mlp_apply(params["dnn"], dnn_in, dropout_rate=self.dnn_dropout,
                           train=train, rng=rng)
        logit = logit + core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        return self._base_reg(p)


# ---------------------------------------------------------------------------
# AdaSparse (reference adasparse.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AdaSparse(ZooBase):
    # reads the scenario embedding via an extra lookup_field on the packed
    # bank (see apply), so the single-embed_fields gather plan does not hold.
    standard_bank_access = False

    dnn_hidden_units: Sequence[int] = (256, 128)
    dnn_dropout: float = 0.0
    # The reference hardcodes domain_emb_dim=32 (adasparse.py:54, 69) while
    # the concatenated domain embedding is actually embedding_dim wide
    # (adasparse.py:167, 94) - a latent crash at any embedding_dim != 32
    # (every published run uses 32, where they coincide).  None = follow
    # embedding_dim, which is what the reference's forward actually needs.
    domain_emb_dim: int | None = None
    beta: float = 2.0
    epsilon: float = 0.25
    alpha: float = 1.0
    att_layer_num: int = 3

    def __post_init__(self):
        self._post()
        self.use_meta = False
        self.use_trans = "usetrans" in self.flag

    def init(self, key):
        ks = iter(jax.random.split(key, 32))
        p = {"emb": embeddings.bank_init(next(ks), self.layout,
                                         init_std=self.init_std),
             "linear": embeddings.linear_model_init(next(ks), self.layout,
                                                    init_std=self.init_std)}
        if self.use_trans:
            p["int_layers"] = [
                attention.self_attention_init(next(ks), self.embedding_dim)
                for _ in range(self.att_layer_num)]
        dims = [self.layout.input_dim()] + list(self.dnn_hidden_units)
        layers, pruners = [], []
        for i in range(len(dims) - 1):
            kw, kb = jax.random.split(next(ks))
            layers.append({"w": init.normal(kw, (dims[i], dims[i + 1]),
                                            self.init_std),
                           "b": init.torch_linear_bias(kb, (dims[i + 1],),
                                                       dims[i])})
            dom_dim = (self.embedding_dim if self.domain_emb_dim is None
                       else self.domain_emb_dim)
            pruners.append(core.linear_init(next(ks), dims[i] + dom_dim,
                                            dims[i + 1]))
        p["dnn_layers"] = layers
        p["pruners"] = pruners
        p["dnn_out"] = core.linear_init(next(ks), self.dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = embeddings.embed_fields(params["emb"], self.layout, batch)
        # Domain embedding comes from the domain feature's OWN embedding
        # (reference adasparse.py:641-642), i.e. the fused bank row.
        ids = batch["sparse"][:, self.layout.sparse_index(self.domain_col)]
        dom_emb = embeddings.lookup_field(params["emb"], self.layout,
                                          self.domain_col, ids,
                                          self.embedding_dim)
        if self.use_trans:
            att = x
            for i, lp in enumerate(params["int_layers"]):
                att = attention.self_attention_apply(
                    lp, att, 4, train=train, rng=jax.random.fold_in(rng, 100 + i))
            h = combined_dnn_input(att, batch.get("dense"),
                                   self.layout.dense_dim)
        else:
            h = combined_dnn_input(x, batch.get("dense"), self.layout.dense_dim)
        for i, (layer, pruner) in enumerate(zip(params["dnn_layers"],
                                                params["pruners"])):
            fc = core.linear_apply(layer, h)
            pi = self.beta * jax.nn.sigmoid(
                self.alpha * core.linear_apply(
                    pruner, jnp.concatenate([h, dom_emb], axis=1)))
            pi = jnp.where(jnp.abs(pi) <= self.epsilon, 0.0, pi)
            fc = fc * pi
            fc = jax.nn.relu(fc)
            fc = core.dropout(fc, self.dnn_dropout, train,
                              jax.random.fold_in(rng, i))
            h = fc
        logit = core.linear_apply(params["dnn_out"], h)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)

    def reg_loss(self, p):
        return self._base_reg(p)
