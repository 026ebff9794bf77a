"""Multi-task models used as multi-DOMAIN learners: SharedBottom, MMOE, PLE,
ESMM.

The reference instantiates these with one "task" per scenario
(``task_types=['binary']*num_domains``, main.py:262-265); the MTL engine then
masks each head's loss to its domain's samples and predict() picks the head
matching each sample's domain (mtl_basemodel.py:262-271, 376-378).  Here
those engine semantics live in ``train.trainer.DomainRouted``; the models
just emit ``[B, num_tasks]`` predictions.

References: sharedbottom.py, mmoe.py, ple.py, esmm.py.  No linear model
(``linear_feature_columns=[]`` upstream).  All support the ``usetrans``
self-attention stack except ESMM (the reference doesn't wire it there).

PLE quirk preserved: the number of shared-expert modules is created from
``specific_expert_num`` (ple.py:272) while the forward loops
``shared_expert_num`` of them (ple.py:345) - identical at the defaults (1,1).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import embeddings
from ..features import FeatureLayout
from ..nn import attention, core
from .common import combined_dnn_input


@dataclasses.dataclass
class _MTLBase:
    # one embed_fields(p["emb"]) per apply -> sparse bank-update eligible
    # (train/bank_optimizer.py)
    standard_bank_access = True

    layout: FeatureLayout
    num_tasks: int = 2
    domain_col: str | None = None
    flag: str = ""
    seed: int = 1024
    task: str = "binary"
    init_std: float = 1e-4
    l2_reg_embedding: float = 1e-5
    dnn_dropout: float = 0.0
    domain_id_offset: int = 1
    att_layer_num: int = 3

    def _post(self):
        self.embedding_dim = self.layout.embedding_dim
        self.use_trans = "usetrans" in self.flag
        self.input_dim = self.layout.input_dim()
        if self.num_tasks <= 1:
            raise ValueError("num_tasks must be greater than 1")

    def set_domain_offset(self, offset: int):
        self.domain_id_offset = int(offset)

    def _init_common(self, ks):
        p = {"emb": embeddings.bank_init(next(ks), self.layout,
                                         init_std=self.init_std)}
        if self.use_trans:
            p["int_layers"] = [
                attention.self_attention_init(next(ks), self.embedding_dim)
                for _ in range(self.att_layer_num)]
        return p

    def _dnn_input(self, p, batch, *, train, rng):
        x = embeddings.embed_fields(p["emb"], self.layout, batch)
        if self.use_trans:
            att = x
            for i, lp in enumerate(p["int_layers"]):
                att = attention.self_attention_apply(
                    lp, att, 4, train=train, rng=jax.random.fold_in(rng, 50 + i))
            return combined_dnn_input(att, batch.get("dense"),
                                      self.layout.dense_dim)
        return combined_dnn_input(x, batch.get("dense"), self.layout.dense_dim)

    def reg_loss(self, p):
        return embeddings.l2_loss(p["emb"], self.l2_reg_embedding)


# ---------------------------------------------------------------------------
# SharedBottom (reference sharedbottom.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SharedBottom(_MTLBase):
    bottom_dnn_hidden_units: Sequence[int] = (256, 128)
    tower_dnn_hidden_units: Sequence[int] = (64,)

    def __post_init__(self):
        self._post()

    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        p = self._init_common(ks)
        p["bottom"] = core.mlp_init(next(ks), self.input_dim,
                                    list(self.bottom_dnn_hidden_units),
                                    init_std=self.init_std)
        towers, outs = [], []
        for _ in range(self.num_tasks):
            if self.tower_dnn_hidden_units:
                towers.append(core.mlp_init(
                    next(ks), self.bottom_dnn_hidden_units[-1],
                    list(self.tower_dnn_hidden_units), init_std=self.init_std))
            outs.append(core.linear_init(
                next(ks),
                self.tower_dnn_hidden_units[-1] if self.tower_dnn_hidden_units
                else self.bottom_dnn_hidden_units[-1], 1, use_bias=False))
        if towers:
            p["towers"] = towers
        p["outs"] = outs
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        h = self._dnn_input(params, batch, train=train, rng=rng)
        bottom = core.mlp_apply(params["bottom"], h,
                                dropout_rate=self.dnn_dropout, train=train,
                                rng=rng)
        preds = []
        for i in range(self.num_tasks):
            t = bottom
            if "towers" in params:
                t = core.mlp_apply(params["towers"][i], t,
                                   dropout_rate=self.dnn_dropout, train=train,
                                   rng=jax.random.fold_in(rng, i))
            logit = core.linear_apply(params["outs"][i], t)
            preds.append(core.prediction(logit, self.task))
        return jnp.concatenate(preds, axis=-1), state, jnp.asarray(0.0)


# ---------------------------------------------------------------------------
# MMOE (reference mmoe.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MMOE(_MTLBase):
    num_experts: int = 3
    expert_dnn_hidden_units: Sequence[int] = (256, 128)
    gate_dnn_hidden_units: Sequence[int] = (64,)
    tower_dnn_hidden_units: Sequence[int] = (64,)

    def __post_init__(self):
        self._post()
        if self.num_experts <= 1:
            raise ValueError("num_experts must be greater than 1")

    def init(self, key):
        ks = iter(jax.random.split(key, 128))
        p = self._init_common(ks)
        p["experts"] = [core.mlp_init(next(ks), self.input_dim,
                                      list(self.expert_dnn_hidden_units),
                                      init_std=self.init_std)
                        for _ in range(self.num_experts)]
        if self.gate_dnn_hidden_units:
            p["gates"] = [core.mlp_init(next(ks), self.input_dim,
                                        list(self.gate_dnn_hidden_units),
                                        init_std=self.init_std)
                          for _ in range(self.num_tasks)]
        gate_in = self.gate_dnn_hidden_units[-1] \
            if self.gate_dnn_hidden_units else self.input_dim
        p["gate_outs"] = [core.linear_init(next(ks), gate_in,
                                           self.num_experts, use_bias=False)
                          for _ in range(self.num_tasks)]
        if self.tower_dnn_hidden_units:
            p["towers"] = [core.mlp_init(next(ks),
                                         self.expert_dnn_hidden_units[-1],
                                         list(self.tower_dnn_hidden_units),
                                         init_std=self.init_std)
                           for _ in range(self.num_tasks)]
        tower_in = self.tower_dnn_hidden_units[-1] \
            if self.tower_dnn_hidden_units else self.expert_dnn_hidden_units[-1]
        p["tower_outs"] = [core.linear_init(next(ks), tower_in, 1,
                                            use_bias=False)
                           for _ in range(self.num_tasks)]
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        h = self._dnn_input(params, batch, train=train, rng=rng)
        experts = jnp.stack(
            [core.mlp_apply(ep, h, dropout_rate=self.dnn_dropout, train=train,
                            rng=jax.random.fold_in(rng, 10 + i))
             for i, ep in enumerate(params["experts"])], axis=1)  # [B,E,dim]
        preds = []
        for i in range(self.num_tasks):
            g = h
            if "gates" in params:
                g = core.mlp_apply(params["gates"][i], g,
                                   dropout_rate=self.dnn_dropout, train=train,
                                   rng=jax.random.fold_in(rng, 20 + i))
            gate = jax.nn.softmax(core.linear_apply(params["gate_outs"][i], g),
                                  axis=1)  # [B, E]
            mixed = jnp.einsum("be,bed->bd", gate, experts)
            t = mixed
            if "towers" in params:
                t = core.mlp_apply(params["towers"][i], t,
                                   dropout_rate=self.dnn_dropout, train=train,
                                   rng=jax.random.fold_in(rng, 30 + i))
            logit = core.linear_apply(params["tower_outs"][i], t)
            preds.append(core.prediction(logit, self.task))
        return jnp.concatenate(preds, axis=-1), state, jnp.asarray(0.0)


# ---------------------------------------------------------------------------
# PLE (reference ple.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PLE(_MTLBase):
    shared_expert_num: int = 1
    specific_expert_num: int = 1
    num_levels: int = 2
    expert_dnn_hidden_units: Sequence[int] = (256, 128)
    gate_dnn_hidden_units: Sequence[int] = (64,)
    tower_dnn_hidden_units: Sequence[int] = (64,)

    def __post_init__(self):
        self._post()

    def init(self, key):
        ks = iter(jax.random.split(key, 256))
        p = self._init_common(ks)
        expert_out = self.expert_dnn_hidden_units[-1]

        def experts(level, n):
            in_dim = self.input_dim if level == 0 else expert_out
            return [core.mlp_init(next(ks), in_dim,
                                  list(self.expert_dnn_hidden_units),
                                  init_std=self.init_std) for _ in range(n)]

        p["specific_experts"] = [
            [experts(lv, self.specific_expert_num) for _ in range(self.num_tasks)]
            for lv in range(self.num_levels)]
        # quirk: module count from specific_expert_num (ple.py:272)
        p["shared_experts"] = [experts(lv, self.specific_expert_num)
                               for lv in range(self.num_levels)]

        spec_gate_out = self.specific_expert_num + self.shared_expert_num
        shared_gate_out = (self.num_tasks * self.specific_expert_num
                           + self.shared_expert_num)
        if self.gate_dnn_hidden_units:
            p["specific_gates"] = [
                [core.mlp_init(next(ks),
                               self.input_dim if lv == 0 else expert_out,
                               list(self.gate_dnn_hidden_units),
                               init_std=self.init_std)
                 for _ in range(self.num_tasks)]
                for lv in range(self.num_levels)]
            p["shared_gates"] = [
                core.mlp_init(next(ks),
                              self.input_dim if lv == 0 else expert_out,
                              list(self.gate_dnn_hidden_units),
                              init_std=self.init_std)
                for lv in range(self.num_levels)]
        gate_in = (lambda lv: self.gate_dnn_hidden_units[-1]
                   if self.gate_dnn_hidden_units
                   else (self.input_dim if lv == 0 else expert_out))
        p["specific_gate_outs"] = [
            [core.linear_init(next(ks), gate_in(lv), spec_gate_out,
                              use_bias=False) for _ in range(self.num_tasks)]
            for lv in range(self.num_levels)]
        p["shared_gate_outs"] = [
            core.linear_init(next(ks), gate_in(lv), shared_gate_out,
                             use_bias=False) for lv in range(self.num_levels)]
        if self.tower_dnn_hidden_units:
            p["towers"] = [core.mlp_init(next(ks), expert_out,
                                         list(self.tower_dnn_hidden_units),
                                         init_std=self.init_std)
                           for _ in range(self.num_tasks)]
        tower_in = self.tower_dnn_hidden_units[-1] \
            if self.tower_dnn_hidden_units else expert_out
        p["tower_outs"] = [core.linear_init(next(ks), tower_in, 1,
                                            use_bias=False)
                           for _ in range(self.num_tasks)]
        return p, {}

    def _cgc(self, params, inputs, level, *, train, rng):
        """One CGC layer (reference ple.py:332-379)."""
        def run_mlp(mp, x, salt):
            return core.mlp_apply(mp, x, dropout_rate=self.dnn_dropout,
                                  train=train,
                                  rng=jax.random.fold_in(rng, salt))

        specific_outs = []  # flat: task-major
        for i in range(self.num_tasks):
            for j in range(self.specific_expert_num):
                specific_outs.append(run_mlp(
                    params["specific_experts"][level][i][j], inputs[i],
                    level * 100 + i * 10 + j))
        shared_outs = [run_mlp(params["shared_experts"][level][k], inputs[-1],
                               level * 100 + 90 + k)
                       for k in range(self.shared_expert_num)]

        outs = []
        for i in range(self.num_tasks):
            cur = specific_outs[i * self.specific_expert_num:
                                (i + 1) * self.specific_expert_num] + shared_outs
            cur = jnp.stack(cur, axis=1)  # [B, n, dim]
            g = inputs[i]
            if "specific_gates" in params:
                g = run_mlp(params["specific_gates"][level][i], g,
                            level * 100 + 50 + i)
            gate = jax.nn.softmax(core.linear_apply(
                params["specific_gate_outs"][level][i], g), axis=1)
            outs.append(jnp.einsum("bn,bnd->bd", gate, cur))

        cur = jnp.stack(specific_outs + shared_outs, axis=1)
        g = inputs[-1]
        if "shared_gates" in params:
            g = run_mlp(params["shared_gates"][level], g, level * 100 + 70)
        gate = jax.nn.softmax(core.linear_apply(
            params["shared_gate_outs"][level], g), axis=1)
        outs.append(jnp.einsum("bn,bnd->bd", gate, cur))
        return outs

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        h = self._dnn_input(params, batch, train=train, rng=rng)
        inputs = [h] * (self.num_tasks + 1)
        for lv in range(self.num_levels):
            inputs = self._cgc(params, inputs, lv, train=train, rng=rng)
        preds = []
        for i in range(self.num_tasks):
            t = inputs[i]
            if "towers" in params:
                t = core.mlp_apply(params["towers"][i], t,
                                   dropout_rate=self.dnn_dropout, train=train,
                                   rng=jax.random.fold_in(rng, 1000 + i))
            logit = core.linear_apply(params["tower_outs"][i], t)
            preds.append(core.prediction(logit, self.task))
        return jnp.concatenate(preds, axis=-1), state, jnp.asarray(0.0)


# ---------------------------------------------------------------------------
# ESMM (reference esmm.py) - exactly 2 tasks: [ctr, ctr*cvr]
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ESMM(_MTLBase):
    tower_dnn_hidden_units: Sequence[int] = (256, 128)

    def __post_init__(self):
        self._post()
        if self.num_tasks != 2:
            raise ValueError("the length of task_names must be equal to 2")

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        p = self._init_common(ks)
        p["ctr_dnn"] = core.mlp_init(next(ks), self.input_dim,
                                     list(self.tower_dnn_hidden_units),
                                     init_std=self.init_std)
        p["cvr_dnn"] = core.mlp_init(next(ks), self.input_dim,
                                     list(self.tower_dnn_hidden_units),
                                     init_std=self.init_std)
        p["ctr_out"] = core.linear_init(next(ks),
                                        self.tower_dnn_hidden_units[-1], 1,
                                        use_bias=False)
        p["cvr_out"] = core.linear_init(next(ks),
                                        self.tower_dnn_hidden_units[-1], 1,
                                        use_bias=False)
        return p, {}

    def apply(self, params, state, batch, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = embeddings.embed_fields(params["emb"], self.layout, batch)
        h = combined_dnn_input(x, batch.get("dense"), self.layout.dense_dim)
        ctr = core.mlp_apply(params["ctr_dnn"], h,
                             dropout_rate=self.dnn_dropout, train=train,
                             rng=rng)
        cvr = core.mlp_apply(params["cvr_dnn"], h,
                             dropout_rate=self.dnn_dropout, train=train,
                             rng=jax.random.fold_in(rng, 1))
        ctr_pred = core.prediction(core.linear_apply(params["ctr_out"], ctr),
                                   self.task)
        cvr_pred = core.prediction(core.linear_apply(params["cvr_out"], cvr),
                                   self.task)
        ctcvr = ctr_pred * cvr_pred  # CTCVR = CTR * CVR (esmm.py:512)
        return jnp.concatenate([ctr_pred, ctcvr], axis=-1), state, \
            jnp.asarray(0.0)
