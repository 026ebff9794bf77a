"""Legacy SATrans lineage: Star_Trans, Starv2/v3/v4_Trans.

Reimplements the research iterations in reference models/star_trans.py
(1,414 lines; SURVEY.md section 2's "Legacy SATrans lineage" row).  main.py
never dispatches these, but they are part of the reference's public surface
(autoint.py imports from the file; the results CSV still formats a
Star_Trans row, main.py:383) and document the design path to SATrans:

* ``StarTrans``   (star_trans.py:674-775): per-domain W_Query attention
  (``MDR_InteractingLayer``, :146-242) with merge in {no, sum, dot} against a
  shared W_Query, per-domain LayerNorms, optional plain attention stack
  before (att_layer_type 'deepctr'=SelfAttention / 'trans'=Transformer+FFN).
* ``Starv2Trans`` (star_trans.py:779-908): a bank of ``num_query_bases``
  query projections mixed by a softmax scenario-DNN, plus the
  **attention-regularization aux loss** that pushes per-domain mixture
  weights apart (attn_regularization_loss, :849-852: segment-mean the
  weights over domains, penalize std below 1).
* ``Starv3Trans`` (star_trans.py:912-1089): meta-MLP on Q/K/V with fixed
  [d, 2d, d] generated weights - the direct SATrans precursor; flags
  layerid/qkvid/cat/norelu/dwmetanorm supported as typed options.
* ``Starv4Trans`` (star_trans.py:1092-1248): two scenario encoders with the
  'aggmap' mean-of-fields conditioning variant.  NOTE: upstream keeps its
  encoders in a plain python list (star_trans.py:1160-1163), so torch never
  registers/trains them - here they are ordinary trained params (deliberate
  fix, documented deviation).

TPU-first: all per-domain routing uses stacked ``[D, ...]`` parameters with
one-hot selection (static shapes) instead of the reference's boolean-mask
scatter writes; the scenario mixture DNN runs on the D+1 distinct domain ids.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import embeddings
from ..features import FeatureLayout
from ..nn import attention, core, initializers as init, metanet
from ..ops import segment
from .common import combined_dnn_input


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def transformer_layer_init(key, dim: int, std: float = 0.05):
    """Transformer_Layer with FFN (star_trans.py:449-508)."""
    ks = jax.random.split(key, 9)
    p = {"wq": init.normal(ks[0], (dim, dim), std),
         "wk": init.normal(ks[1], (dim, dim), std),
         "wv": init.normal(ks[2], (dim, dim), std),
         "wout": init.normal(ks[3], (dim, dim), std),
         "ln": core.layer_norm_init(
             ks[4], dim, weight_init=lambda k, s: init.normal(k, s, std),
             bias_init=lambda k, s: init.normal(k, s, std)),
         # PositionwiseFeedForward (star_trans.py:427-446): torch-default
         # Linear init, LayerNorm default (created after the init loop).
         "ffn1": core.linear_init(ks[5], dim, 2 * dim),
         "ffn2": core.linear_init(ks[6], 2 * dim, dim),
         "ffn_ln": core.layer_norm_init(ks[7], dim)}
    return p


def transformer_layer_apply(p, x, head_num: int, *, dropout_rate=0.1,
                            train=False, rng=None):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    q, k, v = x @ p["wq"], x @ p["wk"], x @ p["wv"]
    out, _ = attention._mha(q, k, v, head_num, scaling=True,
                            attn_dropout=dropout_rate, train=train, rng=r1)
    out = core.dropout(out @ p["wout"], dropout_rate, train, r2)
    out = out + x
    out = core.layer_norm_apply(p["ln"], out)
    # FFN with residual + LN
    h = jax.nn.relu(core.linear_apply(p["ffn1"], out))
    h = core.dropout(core.linear_apply(p["ffn2"], h), dropout_rate, train, r3)
    return core.layer_norm_apply(p["ffn_ln"], h + out)


def mdr_interacting_init(key, dim: int, num_domains: int, std: float = 0.05):
    """MDR_InteractingLayer (star_trans.py:146-242): shared K/V, per-domain
    W_Query and LayerNorm."""
    ks = jax.random.split(key, 6)
    return {
        "wq_shared": init.normal(ks[0], (dim, dim), std),
        "wq_domain": init.normal(ks[1], (num_domains, dim, dim), std),
        "wk": init.normal(ks[2], (dim, dim), std),
        "wv": init.normal(ks[3], (dim, dim), std),
        "wres": init.normal(ks[4], (dim, dim), std),
        # per-domain LNs are inside the reference's N(0,0.05) init loop
        "ln_scale": init.normal(jax.random.fold_in(ks[5], 0),
                                (num_domains, dim), std),
        "ln_bias": init.normal(jax.random.fold_in(ks[5], 1),
                               (num_domains, dim), std),
    }


def mdr_interacting_apply(p, x, domain_onehot, head_num: int, *,
                          merge: str = "no", dropout_rate=0.1, train=False,
                          rng=None):
    """Each example attends with its domain's query projection."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    if merge == "sum":
        wq = p["wq_domain"] + p["wq_shared"][None]
    elif merge == "dot":
        wq = p["wq_domain"] * p["wq_shared"][None]
    elif merge == "no":
        wq = p["wq_domain"]
    else:
        raise NotImplementedError("merge must be no/sum/dot")
    # per-example query weight via one-hot mix (static-shape routing)
    q = jnp.einsum("bfd,bde->bfe", x,
                   jnp.einsum("bD,Dde->bde", domain_onehot, wq))
    k, v = x @ p["wk"], x @ p["wv"]
    out, _ = attention._mha(q, k, v, head_num, scaling=True,
                            attn_dropout=dropout_rate, train=train, rng=r1)
    out = core.dropout(out, dropout_rate, train, r2)
    out = out + x @ p["wres"]
    out = jax.nn.relu(out)
    scale = domain_onehot @ p["ln_scale"]  # [B, d]
    bias = domain_onehot @ p["ln_bias"]
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(out - mean), axis=-1, keepdims=True)
    normed = (out - mean) * jax.lax.rsqrt(var + 1e-6)
    return normed * scale[:, None, :] + bias[:, None, :]


def mdr_interacting_v2_init(key, dim: int, num_domains: int,
                            num_query_bases: int, std: float = 0.05, *,
                            with_ffn: bool = False):
    """MDR_InteractingLayer_v2 / MDR_Transformer_layer
    (star_trans.py:245-332, 511-596)."""
    ks = jax.random.split(key, 8)
    p = {"wq_bases": init.normal(ks[0], (num_query_bases, dim, dim), std),
         "wk": init.normal(ks[1], (dim, dim), std),
         "wv": init.normal(ks[2], (dim, dim), std),
         "wres": init.normal(ks[3], (dim, dim), std)}
    if with_ffn:
        p["wout"] = init.normal(ks[4], (dim, dim), std)
        p["ln"] = core.layer_norm_init(
            ks[5], dim, weight_init=lambda k, s: init.normal(k, s, std),
            bias_init=lambda k, s: init.normal(k, s, std))
        p["ffn1"] = core.linear_init(ks[6], dim, 2 * dim)
        p["ffn2"] = core.linear_init(ks[7], 2 * dim, dim)
        p["ffn_ln"] = core.layer_norm_init(jax.random.fold_in(ks[7], 1), dim)
    else:
        p["ln_scale"] = init.normal(jax.random.fold_in(ks[4], 0),
                                    (num_domains, dim), std)
        p["ln_bias"] = init.normal(jax.random.fold_in(ks[4], 1),
                                   (num_domains, dim), std)
    return p


def mdr_interacting_v2_apply(p, x, domain_onehot, query_weights,
                             head_num: int, *, dropout_rate=0.1, train=False,
                             rng=None):
    """Queries are a softmax mixture of base projections
    (star_trans.py:299-305)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    # mixture weight per example: [B, nbases]; bases [n, d, d]
    wq = jnp.einsum("bn,nde->bde", query_weights, p["wq_bases"])
    q = jnp.einsum("bfd,bde->bfe", x, wq)
    k, v = x @ p["wk"], x @ p["wv"]
    out, _ = attention._mha(q, k, v, head_num, scaling=True,
                            attn_dropout=dropout_rate, train=train, rng=r1)
    if "wout" in p:  # MDR_Transformer_layer: Out_linear + shared LN + FFN
        out = core.dropout(out @ p["wout"], dropout_rate, train, r2)
        out = out + x
        out = core.layer_norm_apply(p["ln"], out)
        h = jax.nn.relu(core.linear_apply(p["ffn1"], out))
        h = core.dropout(core.linear_apply(p["ffn2"], h), dropout_rate,
                         train, r3)
        return core.layer_norm_apply(p["ffn_ln"], h + out)
    out = core.dropout(out, dropout_rate, train, r2)
    out = out + x @ p["wres"]
    out = jax.nn.relu(out)
    scale = domain_onehot @ p["ln_scale"]
    bias = domain_onehot @ p["ln_bias"]
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(out - mean), axis=-1, keepdims=True)
    return ((out - mean) * jax.lax.rsqrt(var + 1e-6)
            ) * scale[:, None, :] + bias[:, None, :]


def attn_regularization_loss(query_weights, domain_ids, num_domains: int):
    """Starv2's aux loss (star_trans.py:849-852): per-domain mean mixture
    weights (segment mean, ids 1..D), penalize std-across-domains below 1:
    ``(std + |std|).sum() / (2*nbases)`` with ``std = 1 - sqrt(var + 1e-4)``.

    Variance across domains is unbiased (ddof=1) to match torch's
    ``attn_score.var(0)`` default (star_trans.py:851)."""
    per_domain = segment.segment_mean(query_weights, domain_ids,
                                      num_segments=num_domains + 1)[1:]
    var = jnp.var(per_domain, axis=0, ddof=1)
    std = 1.0 - jnp.sqrt(var + 1e-4)
    return jnp.sum(std + jnp.abs(std)) / (2 * query_weights.shape[-1])


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _LegacyBase:
    # one embed_fields(p["emb"]) per apply -> sparse bank-update eligible
    # (train/bank_optimizer.py)
    standard_bank_access = True

    layout: FeatureLayout
    domain_col: str = ""
    num_domains: int = 3
    domain_id_as_feature: bool = False
    att_layer_num: int = 2
    domain_att_layer_num: int = 1
    att_head_num: int = 2
    att_layer_type: str = "deepctr"
    use_domain_dnn_linear: bool = False
    use_linear: bool = True
    flag: str = ""
    seed: int = 1024
    task: str = "binary"
    init_std: float = 1e-4
    l2_reg_embedding: float = 1e-5
    dropout_rate: float = 0.1
    domain_id_offset: int = 1
    num_tasks: int = 1

    def _post(self):
        self.embedding_dim = self.layout.embedding_dim
        self.domain_cols = [self.domain_col]
        # without domain_id_as_feature the domain column is excluded from the
        # attention fields (star_trans.py:698-702); we keep the fused bank but
        # drop its field from the stack.
        self.active_fields = [i for i, name in
                              enumerate(self.layout.sparse_names
                                        + self.layout.varlen_names)
                              if self.domain_id_as_feature
                              or name != self.domain_col]
        self.head_in = (len(self.active_fields) * self.embedding_dim
                        + self.layout.dense_dim)

    def set_domain_offset(self, offset: int):
        self.domain_id_offset = int(offset)

    def _init_common(self, ks):
        p = {"emb": embeddings.bank_init(next(ks), self.layout,
                                         init_std=self.init_std)}
        if self.use_linear:
            p["linear"] = embeddings.linear_model_init(next(ks), self.layout,
                                                       init_std=self.init_std)
        if self.use_domain_dnn_linear:
            outs = [core.linear_init(next(ks), self.head_in, 1)
                    for _ in range(self.num_domains)]
            p["head_w"] = jnp.stack([o["w"] for o in outs])
            p["head_b"] = jnp.stack([o["b"] for o in outs])
        else:
            p["head"] = core.linear_init(next(ks), self.head_in, 1)
        return p

    def _fields(self, p, batch):
        x = embeddings.embed_fields(p["emb"], self.layout, batch)
        return x[:, jnp.asarray(self.active_fields)]

    def _head(self, p, att_out, batch, domain_onehot):
        flat = att_out.reshape(att_out.shape[0], -1)
        if self.layout.dense_dim > 0 and "dense" in batch:
            flat = jnp.concatenate([flat, batch["dense"]], axis=1)
        if self.use_domain_dnn_linear:
            logit_d = jnp.einsum("bi,dio->bdo", flat, p["head_w"]) \
                + p["head_b"][None]
            return jnp.einsum("bdo,bd->bo", logit_d, domain_onehot)
        return core.linear_apply(p["head"], flat)

    def _logit0(self, p, batch):
        if self.use_linear:
            return embeddings.linear_model_apply(p["linear"], self.layout,
                                                 batch)
        return 0.0

    def reg_loss(self, p):
        loss = embeddings.l2_loss(p["emb"], self.l2_reg_embedding)
        # l2_reg_linear=0 upstream (star_trans.py:684)
        return loss

    def _domain(self, batch):
        ids = batch["sparse"][:, self.layout.sparse_index(self.domain_col)]
        onehot = jax.nn.one_hot(ids - self.domain_id_offset, self.num_domains)
        return ids, onehot


@dataclasses.dataclass
class StarTrans(_LegacyBase):
    merge: str = "no"

    def __post_init__(self):
        self._post()

    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        p = self._init_common(ks)
        d = self.embedding_dim
        if self.att_layer_type == "deepctr":
            p["int_layers"] = [attention.self_attention_init(next(ks), d)
                               for _ in range(self.att_layer_num)]
        elif self.att_layer_type == "trans":
            p["int_layers"] = [transformer_layer_init(next(ks), d)
                               for _ in range(self.att_layer_num)]
        else:
            raise NotImplementedError(f"{self.att_layer_type} invalid!")
        p["domain_int_layers"] = [
            mdr_interacting_init(next(ks), d, self.num_domains)
            for _ in range(self.domain_att_layer_num)]
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ids, onehot = self._domain(batch)
        x = self._fields(params, batch)
        logit = self._logit0(params, batch)
        for i, lp in enumerate(params["int_layers"]):
            r = jax.random.fold_in(rng, i)
            if self.att_layer_type == "deepctr":
                x = attention.self_attention_apply(lp, x, self.att_head_num,
                                                   train=train, rng=r)
            else:
                x = transformer_layer_apply(lp, x, self.att_head_num,
                                            train=train, rng=r)
        for i, lp in enumerate(params["domain_int_layers"]):
            x = mdr_interacting_apply(lp, x, onehot, self.att_head_num,
                                      merge=self.merge, train=train,
                                      rng=jax.random.fold_in(rng, 100 + i))
        logit = logit + self._head(params, x, batch, onehot)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)


@dataclasses.dataclass
class Starv2Trans(_LegacyBase):
    num_query_bases: int = 3
    share_domain_dnn_across_layers: bool = False
    attn_batch_reg: float = 0.1

    def __post_init__(self):
        self._post()

    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        p = self._init_common(ks)
        d = self.embedding_dim
        p["domain_emb"] = init.torch_embedding_default(
            next(ks), (self.num_domains + 1, d))
        with_ffn = self.att_layer_type == "trans"
        p["domain_int_layers"] = [
            mdr_interacting_v2_init(next(ks), d, self.num_domains,
                                    self.num_query_bases, with_ffn=with_ffn)
            for _ in range(self.domain_att_layer_num)]
        n_dnns = 1 if self.share_domain_dnn_across_layers \
            else self.domain_att_layer_num
        p["weight_dnns"] = [
            core.mlp_init(next(ks), d, [2 * d, self.num_query_bases],
                          init_std=self.init_std, final_activation=False)
            for _ in range(n_dnns)]
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ids, onehot = self._domain(batch)
        x = self._fields(params, batch)
        logit = self._logit0(params, batch)
        dom_emb = jax.nn.relu(params["domain_emb"][ids])
        weights_list = [
            jax.nn.softmax(core.mlp_apply(dp, dom_emb,
                                          final_activation=False), axis=-1)
            for dp in params["weight_dnns"]]
        # attention-regularization aux loss (star_trans.py:874-876):
        # scaled by attn_batch_reg * batch_size in add_auxiliary_loss.
        # The batch size is the REAL sample count: the Trainer zero-pads the
        # tail batch and passes its 0/1 mask as batch["_weight"]; the
        # reference trains on a genuinely smaller tail batch.
        regs = [attn_regularization_loss(w, ids, self.num_domains)
                for w in weights_list]
        n_real = (jnp.sum(batch["_weight"]) if "_weight" in batch
                  else x.shape[0])
        aux = jnp.mean(jnp.stack(regs)) * self.attn_batch_reg * n_real
        for i, lp in enumerate(params["domain_int_layers"]):
            w = weights_list[i] if len(weights_list) > 1 else weights_list[0]
            x = mdr_interacting_v2_apply(lp, x, onehot, w, self.att_head_num,
                                         train=train,
                                         rng=jax.random.fold_in(rng, i))
        logit = logit + self._head(params, x, batch, onehot)
        return core.prediction(logit, self.task)[:, 0], state, aux


@dataclasses.dataclass
class Starv3Trans(_LegacyBase):
    meta_mode: str = "Q"

    def __post_init__(self):
        self._post()
        d = self.embedding_dim
        self.meta_units = [d, 2 * d, d]  # fixed 2x hidden (star_trans.py:1019)
        self.use_layerid = "layerid" in self.flag
        self.use_qkvid = "qkvid" in self.flag
        self.use_cat = "cat" in self.flag
        enc_in = d
        if self.use_layerid and self.use_cat:
            enc_in += d
        if self.use_qkvid and self.use_cat:
            enc_in += d
        self.enc_in = enc_in

    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        p = self._init_common(ks)
        d = self.embedding_dim
        p["domain_emb"] = init.torch_embedding_default(
            next(ks), (self.num_domains + 1, d))
        p["layers"] = [
            attention.meta_transformer_init(next(ks), d, self.meta_units,
                                            share_kv_metanet=True)
            for _ in range(self.domain_att_layer_num)]
        psize = metanet.param_size(self.meta_units)
        hidden = [2 * d, psize] if "large" in self.flag else [psize]
        # 'norelu' -> DNN_v2 (no final act); default DNN (relu everywhere,
        # star_trans.py:1059-1063)
        p["encoder"] = core.mlp_init(next(ks), self.enc_in, hidden,
                                     init_std=self.init_std,
                                     final_activation="norelu" not in self.flag)
        if self.use_layerid:
            p["layerid_emb"] = init.torch_embedding_default(
                next(ks), (self.domain_att_layer_num, d))
        if self.use_qkvid:
            p["qkvid_emb"] = init.torch_embedding_default(next(ks), (3, d))
        return p, {}

    def _encode(self, p, emb):
        return core.mlp_apply(p["encoder"], emb,
                              final_activation="norelu" not in self.flag)

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ids, onehot = self._domain(batch)
        x = self._fields(params, batch)
        logit = self._logit0(params, batch)
        table = params["domain_emb"]  # [D+1, d]
        if not self.use_layerid:
            vec = self._encode(params, jax.nn.relu(table))
            per = {"Q": vec, "K": vec, "V": vec}
            tables = [per] * self.domain_att_layer_num
        else:
            tables = []
            for lid in range(self.domain_att_layer_num):
                per = {}
                for qkv, name in enumerate(("Q", "K", "V")):
                    lemb = params["layerid_emb"][lid]
                    parts = [table, jnp.broadcast_to(lemb, table.shape)]
                    if self.use_qkvid:
                        parts.append(jnp.broadcast_to(
                            params["qkvid_emb"][qkv], table.shape))
                    if self.use_cat:
                        # cat: [domain, layerid(, qkvid)] side by side
                        # (star_trans.py:1038-1041)
                        e = jnp.concatenate(parts, -1)
                    else:
                        e = sum(parts[1:], parts[0])
                    per[name] = self._encode(params, jax.nn.relu(e))
                    if not self.use_qkvid:
                        per = {"Q": per["Q"], "K": per["Q"], "V": per["Q"]}
                        break
                tables.append(per)
        for i, lp in enumerate(params["layers"]):
            x = attention.meta_transformer_apply(
                lp, x, tables[i], self.meta_units, mode=self.meta_mode,
                head_num=self.att_head_num, train=train,
                rng=jax.random.fold_in(rng, i), domain_ids=ids)
        logit = logit + self._head(params, x, batch, onehot)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)


@dataclasses.dataclass
class Starv4Trans(_LegacyBase):
    meta_mode: str = "Q"

    def __post_init__(self):
        self._post()
        d = self.embedding_dim
        self.meta_units = [d, 2 * d, d]
        self.use_aggmap = "aggmap" in self.flag
        self.enc_in = 2 * d if self.use_aggmap else d

    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        p = self._init_common(ks)
        d = self.embedding_dim
        p["domain_emb"] = init.torch_embedding_default(
            next(ks), (self.num_domains + 1, d))
        p["layers"] = [
            attention.meta_transformer_init(next(ks), d, self.meta_units,
                                            share_kv_metanet=True)
            for _ in range(self.domain_att_layer_num)]
        psize = metanet.param_size(self.meta_units)
        hidden = [2 * d, psize] if "large" in self.flag else [psize]
        p["encoders"] = [core.mlp_init(next(ks), self.enc_in, hidden,
                                       init_std=self.init_std,
                                       final_activation="norelu" not in self.flag)
                         for _ in range(2)]
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ids, onehot = self._domain(batch)
        x = self._fields(params, batch)
        logit = self._logit0(params, batch)
        final_act = "norelu" not in self.flag
        for i, lp in enumerate(params["layers"]):
            if self.use_aggmap:
                # per-example conditioning on the (detached) mean field
                # embedding (star_trans.py:1201-1205) - per-example path.
                extra = jax.lax.stop_gradient(jnp.mean(x, axis=1))
                dom_emb = params["domain_emb"][ids]
                e = jax.nn.relu(jnp.concatenate([dom_emb, extra], axis=-1))
                vec = core.mlp_apply(params["encoders"][1], e,
                                     final_activation=final_act)
                per = {"Q": vec, "K": vec, "V": vec}
                x = attention.meta_transformer_apply(
                    lp, x, per, self.meta_units, mode=self.meta_mode,
                    head_num=self.att_head_num, train=train,
                    rng=jax.random.fold_in(rng, i))
            else:
                table = jax.nn.relu(params["domain_emb"])
                vec = core.mlp_apply(params["encoders"][1], table,
                                     final_activation=final_act)
                per = {"Q": vec, "K": vec, "V": vec}
                x = attention.meta_transformer_apply(
                    lp, x, per, self.meta_units, mode=self.meta_mode,
                    head_num=self.att_head_num, train=train,
                    rng=jax.random.fold_in(rng, i), domain_ids=ids)
        logit = logit + self._head(params, x, batch, onehot)
        return core.prediction(logit, self.task)[:, 0], state, jnp.asarray(0.0)
