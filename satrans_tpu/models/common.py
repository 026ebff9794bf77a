"""Shared scaffolding for the baseline model zoo.

Bundles what the reference's ``BaseModel.__init__`` builds for every model
(basemodel.py:124-189): the fused embedding bank, the first-order Linear
model, and - when a ``domain_column`` is configured - the optional "meta
module" (scenario embedding + DNN_v2 encoder + MetaNet) enabling the
``metatrans`` input transformation hook that several baselines expose
(deepfm.py:91-93, autoint.py:84-87, ...).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import embeddings
from ..features import FeatureLayout
from ..nn import core, initializers as init, metanet


def combined_dnn_input(sparse_emb, dense, dense_dim: int):
    """Flatten field embeddings and concat dense values
    (deepctr ``combined_dnn_input``)."""
    flat = sparse_emb.reshape(sparse_emb.shape[0], -1)
    if dense_dim > 0 and dense is not None:
        flat = jnp.concatenate([flat, dense], axis=1)
    return flat


@dataclasses.dataclass
class ZooBase:
    """Common config/params for single-task baselines (engine A models)."""

    # every ZooBase model reads the packed bank through exactly one
    # embed_fields(p["emb"]) call (_embed below), so the Trainer's sparse
    # bank-update modes apply (train/bank_optimizer.py).  AdaSparse opts out
    # (extra lookup_field on the same bank, zoo.py).
    standard_bank_access = True

    layout: FeatureLayout
    domain_col: str | None = None
    num_domains: int | None = None
    flag: str = ""
    seed: int = 1024
    task: str = "binary"
    init_std: float = 1e-4
    l2_reg_embedding: float = 1e-5
    l2_reg_linear: float = 1e-5
    # None derives [d, 2d, d] - equal to the reference's hard-coded
    # (32, 64, 32) at embedding_dim=32 (basemodel.py:128) but dim-safe.
    meta_dnn_hidden_units: Sequence[int] | None = None
    num_tasks: int = 1

    def _post(self):
        self.embedding_dim = self.layout.embedding_dim
        self.use_meta = bool(self.domain_col) and (
            "metatrans" in self.flag or "usemetatrans" in self.flag)
        if self.meta_dnn_hidden_units is None:
            d = self.embedding_dim
            self.meta_units = [d, 2 * d, d]
        else:
            self.meta_units = [int(u) for u in self.meta_dnn_hidden_units]
        self.meta_param_size = metanet.param_size(self.meta_units)

    # -- init helpers ---------------------------------------------------
    def _init_base(self, ks, *, use_linear: bool = True):
        """ks: iterator of PRNG keys. Returns the base param dict."""
        p = {"emb": embeddings.bank_init(
            next(ks), self.layout,
            init_std=None if "noembinit" in self.flag else self.init_std)}
        if use_linear:
            p["linear"] = embeddings.linear_model_init(next(ks), self.layout,
                                                       init_std=self.init_std)
        if self.domain_col and self.num_domains:
            # meta module (reference basemodel.py:132-148)
            p["domain_emb"] = init.torch_embedding_default(
                next(ks), (self.num_domains + 1, self.embedding_dim))
            p["domain_map"] = core.mlp_init(
                next(ks), self.embedding_dim, [self.meta_param_size],
                init_std=self.init_std, final_activation=False)
            p["meta_net"] = metanet.init(next(ks), self.embedding_dim,
                                         use_norm="metanorm" in self.flag)
        return p

    def _meta_transform(self, p, batch, sparse_emb, *, train, rng):
        """The ``metatrans`` hook (reference basemodel.py:191-199)."""
        ids = batch["sparse"][:, self.layout.sparse_index(self.domain_col)]
        # Fast path: encoder over the D+1 distinct ids (see models/satrans.py).
        table = jax.nn.relu(p["domain_emb"])
        vec = core.mlp_apply(p["domain_map"], table, final_activation=False)
        return metanet.apply_domainwise(p["meta_net"], sparse_emb, ids, vec,
                                        self.meta_units, dropout_rate=0.1,
                                        train=train, rng=rng)

    def _embed(self, p, batch, *, train=False, rng=None):
        """Field embeddings with the optional metatrans hook applied."""
        x = embeddings.embed_fields(p["emb"], self.layout, batch)
        if self.use_meta:
            x = self._meta_transform(p, batch, x, train=train,
                                     rng=rng if rng is not None
                                     else jax.random.PRNGKey(0))
        return x

    # -- reg helpers ----------------------------------------------------
    def _base_reg(self, p):
        loss = embeddings.l2_loss(p["emb"], self.l2_reg_embedding)
        if "linear" in p:
            loss = loss + embeddings.linear_model_l2(p["linear"],
                                                     self.l2_reg_linear)
        return loss
