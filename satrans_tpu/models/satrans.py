"""SATrans: Scenario-Adaptive Transformer for multi-domain CTR.

From-scratch TPU-native reimplementation of the reference flagship
(models/satrans.py:105-256, KDD'23 "Scenario-Adaptive Feature Interaction for
Click-Through Rate Prediction").

Architecture (reference forward, satrans.py:197-256):

1. field embeddings ``[B, F, d]`` from the fused bank
2. scenario embedding: separate ``[D+1, d]`` table (torch-default N(0,1)
   init, satrans.py:145), ReLU
3. scenario encoder: ``DNN_v2(d -> P)`` emitting the flat MetaNet parameters,
   shared across Q/K/V and layers (satrans.py:178-180)
4. a stack of ``Meta_Transformer_Layer``s whose Q/K projections are
   transformed by scenario-generated MLPs (meta_mode 'QK' in the sota config)
5. head: flatten + concat dense + single Linear -> sigmoid (no linear model,
   no DNN: use_linear=use_dnn=False in the sota dispatch, main.py:283-306)

TPU-first redesign (the key deviation from the reference):

The reference evaluates the scenario encoder on every example - a
``[B, d] @ [d, P]`` GEMM with P=4096 producing a [B, 4096] tensor per step
(satrans.py:217-220), then slices per-example weight matrices.  But the
encoder input depends ONLY on the scenario id (and layer/qkv position ids in
the 'pos' variant), of which there are ``D+1`` (resp. ``3L*(D+1)``) distinct
values.  We therefore evaluate the encoder on the ``D+1``-row identity table
and let the MetaNet gather per-domain weights (nn/metanet.py
``apply_domainwise``): ~B/(D+1) x fewer encoder FLOPs and HBM bytes.  The
faithful per-example path remains for the multi-scenario-column variant
(mean of several feature-column embeddings, satrans.py:205-207), where meta
params genuinely vary per example.

Variants (reference ``flag`` substrings, all supported as typed options):
``pos`` (per-(layer,qkv) MetaNets + layerid/qkvid embeddings,
satrans.py:167-171/225-234), ``gate``, ``bilinear``, ``onlyemb``, ``relu``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import embeddings
from ..features import FeatureLayout
from ..nn import attention, core, initializers as init, metanet


@dataclasses.dataclass
class SATrans:
    # the only packed-bank access is one embed_fields(p["emb"]) call, so the
    # Trainer's sparse bank-update modes apply (train/bank_optimizer.py);
    # the multi-column variant's domain_bank is a separate real bank.
    standard_bank_access = True

    layout: FeatureLayout
    domain_cols: Sequence[str]
    num_domains_list: Sequence[int]
    domain_att_layer_num: int = 3
    att_head_num: int = 4
    meta_mode: str = "QK"
    meta_dnn_hidden_units: Sequence[int] = (64, 32)
    l2_reg_embedding: float = 1e-5
    init_std: float = 1e-4
    task: str = "binary"
    dropout_rate: float = 0.1
    seed: int = 1024
    # flag-derived options
    use_pos: bool = False          # 'pos'
    variant: str = "metanet"       # 'gate' / 'bilinear' -> those flags
    only_emb: bool = False         # 'onlyemb'
    relu_out: bool = False         # 'relu'
    no_emb_init: bool = False      # 'noembinit'
    # TPU fast path: with a single scenario column, run one dense GEMM per
    # domain and one-hot select instead of per-example batched matmuls -
    # measured ~17% faster per train step on v5e (see bench.py). Equality
    # with the gather path is covered by tests.
    dense_select: bool = True
    # 'bfloat16' runs the interaction stack in the MXU-native dtype (params
    # stay fp32; LayerNorm/softmax reduce in fp32) - measured 1.5x on the
    # stack forward on v5e. 'float32' (default) is bit-parity mode.
    compute_dtype: str = "float32"
    # Fused Pallas meta-transformer layer (ops/pallas/meta_block.py):
    # None = auto (on for the QK/metanet/single-column sota shape on TPU),
    # True/False forces. Falls back transparently when unsupported.
    use_fused_kernel: bool | None = None
    # 128 measured best on v5e under both attention variants
    # (docs/PERFORMANCE.md); env SATRANS_BLOCK_B overrides for sweeps.
    fused_block_b: int = dataclasses.field(
        # read PER INSTANCE (a plain default would bake the env value in
        # at import time, ignoring later os.environ changes in sweeps)
        default_factory=lambda: int(os.environ.get("SATRANS_BLOCK_B",
                                                   "128")))
    fused_interpret: bool = False  # interpret-mode kernels (CPU tests)

    def __post_init__(self):
        d = self.layout.embedding_dim
        self.embedding_dim = d
        # meta_units = [d] + hidden (reference satrans.py:146-149)
        self.meta_units = [d] + [int(u) for u in self.meta_dnn_hidden_units]
        if self.variant == "metanet" and self.meta_units[-1] != d:
            raise ValueError(
                f"meta_dnn_hidden_units must end with embedding_dim={d} for "
                f"the MetaNet residual, got {self.meta_dnn_hidden_units}")
        if d % self.att_head_num:
            # the reference crashes in torch.stack(torch.split(...)) on a
            # non-dividing head count; fail at construction instead (the
            # fused kernel's lane masks would otherwise silently zero the
            # remainder lanes)
            raise ValueError(
                f"embedding_dim={d} must divide att_head_num="
                f"{self.att_head_num}")
        if self.only_emb and self.use_pos:
            # 'pos' concatenates position embeddings BEFORE the scenario
            # encoder (satrans.py:167-171); 'onlyemb' removes that encoder
            # (the scenario table holds the meta params directly,
            # satrans.py:173-176).  Combined, the pos columns would be
            # silently sliced off downstream - reject the contradiction.
            raise ValueError("only_emb and use_pos are mutually exclusive "
                             "(onlyemb has no scenario encoder to consume "
                             "the position embeddings)")
        if self.variant == "bilinear":
            self.meta_param_size = (d * d) // self.att_head_num
        elif self.variant == "gate":
            self.meta_param_size = d
        else:
            self.meta_param_size = metanet.param_size(self.meta_units)
        self.domain_embedding_dim = 2 * d if self.use_pos else d
        self.num_domains = int(self.num_domains_list[0])
        # Multi-scenario-column fast path (VERDICT r4 next #1): the encoder
        # input is the MEAN of the S columns' embeddings (reference
        # satrans.py:205-207), so the distinct meta-parameter sets number at
        # most prod(D_i + 1) - the composite PRODUCT-DOMAIN table.  When
        # that product is small we evaluate the encoder over the full combo
        # grid once and ride the whole single-column machinery (composite
        # ids + one-hot select + the fused kernel) instead of per-example
        # params; the faithful per-example path remains for large products.
        self.product_domains = 1
        for n in self.num_domains_list:
            self.product_domains *= int(n) + 1
        self.composite_max = int(os.environ.get("SATRANS_COMPOSITE_MAX",
                                                "256"))
        self.use_composite = (len(self.domain_cols) > 1
                              and self.product_domains <= self.composite_max)
        # rows of the per-domain meta tables ( = one-hot width downstream)
        self.meta_rows = (self.num_domains + 1
                          if len(self.domain_cols) == 1
                          else self.product_domains)
        self.head_in = self.layout.num_fields * d + self.layout.dense_dim

    # ------------------------------------------------------------------
    def init(self, key):
        # 16 keys cover stacks up to 8 layers (emb, domain_emb, encoder,
        # 2x pos tables, L layers, domain_bank, head); deeper stacks need
        # more.  max() keeps the split count - and therefore every derived
        # key and the pinned golden AUCs - unchanged for existing configs.
        ks = iter(jax.random.split(key,
                                   max(16, self.domain_att_layer_num + 8)))
        p: dict = {}
        p["emb"] = embeddings.bank_init(
            next(ks), self.layout,
            init_std=None if self.no_emb_init else self.init_std)
        if self.only_emb:
            # scenario table directly holds the meta params (satrans.py:173-176)
            p["domain_emb"] = init.torch_embedding_default(
                next(ks), (self.num_domains + 1, self.meta_param_size))
        else:
            p["domain_emb"] = init.torch_embedding_default(
                next(ks), (self.num_domains + 1, self.embedding_dim))
            # scenario encoder: DNN_v2(domain_embedding_dim -> P), output layer
            # without activation (satrans.py:178)
            p["encoder"] = core.mlp_init(
                next(ks), self.domain_embedding_dim, [self.meta_param_size],
                init_std=self.init_std, final_activation=False)
        if self.use_pos:
            p["layerid_emb"] = init.torch_embedding_default(
                next(ks), (self.domain_att_layer_num, self.embedding_dim))
            p["qkvid_emb"] = init.torch_embedding_default(
                next(ks), (3, self.embedding_dim))
        p["layers"] = [
            attention.meta_transformer_init(
                next(ks), self.embedding_dim, self.meta_units,
                variant=self.variant, share_kv_metanet=not self.use_pos)
            for _ in range(self.domain_att_layer_num)
        ]
        if len(self.domain_cols) > 1:
            # Multi-scenario-column variant keeps its own full-width bank
            # (reference satrans.py:186-188 creates a second embedding dict).
            p["domain_bank"] = embeddings.bank_init(
                next(ks), self.layout, init_std=self.init_std)
        p["head"] = core.linear_init(next(ks), self.head_in, 1)
        return p, {}

    # ------------------------------------------------------------------
    def _encode(self, p, domain_emb):
        """Scenario embedding -> flat meta params (reference satrans.py:213-220)."""
        if self.only_emb:
            return domain_emb
        return core.mlp_apply(p["encoder"], domain_emb,
                              final_activation=False)

    def _meta_param_tables(self, p):
        """Fast path: encoder over the D+1 distinct scenario ids.

        Returns per-layer list of {'Q','K','V'[,'bilinear']} -> [D+1, P].
        """
        return self._tables_from_base(p, jax.nn.relu(p["domain_emb"]))

    def _tables_from_base(self, p, table):
        """Encoder over an already-ReLU'd base table ``[R, d or P]``.

        Shared by the single-column (R = D+1 scenario ids) and composite
        multi-column (R = prod(D_i+1) combos) tabular paths."""
        L = self.domain_att_layer_num
        if not self.use_pos:
            vec = self._encode(p, table)  # [R, P]
            per = {"Q": vec, "K": vec, "V": vec, "bilinear": vec}
            return [per] * L
        # 'pos': distinct params per (layer, qkv) (satrans.py:225-234)
        out = []
        for layer_id in range(L):
            per = {}
            for qkv_id, name in enumerate(("Q", "K", "V")):
                pos = p["layerid_emb"][layer_id] + p["qkvid_emb"][qkv_id]
                all_emb = jnp.concatenate(
                    [table, jnp.broadcast_to(pos, (table.shape[0], pos.shape[0]))],
                    axis=-1)
                all_emb = jax.nn.relu(all_emb)
                per[name] = self._encode(p, all_emb)
            per["bilinear"] = per["Q"]
            out.append(per)
        return out

    def _composite_base(self, p):
        """Composite product-domain base table ``[prod(D_i+1), d]``.

        Row ``(i_0, ..., i_{S-1})`` (row-major) holds
        ``relu(mean_s(emb_s[i_s]))`` - exactly the per-example encoder
        input (reference satrans.py:205-207: mean of the scenario
        columns' embeddings, then ReLU) for every combination at once."""
        tabs = [embeddings.lookup_field(
                    p["domain_bank"], self.layout, c,
                    jnp.arange(int(n) + 1))
                for c, n in zip(self.domain_cols, self.num_domains_list)]
        acc = tabs[0]                              # [D_0+1, d]
        for t in tabs[1:]:
            acc = (acc[:, None, :] + t[None, :, :]).reshape(-1, t.shape[-1])
        return jax.nn.relu(acc / len(tabs))

    def _composite_ids(self, batch):
        """Row-major combo index matching :meth:`_composite_base`.

        Ids are clipped to each column's [0, D_i] contract range, same as
        the single-column path (out-of-range ids would otherwise index a
        different combo's row)."""
        cid = None
        for c, n in zip(self.domain_cols, self.num_domains_list):
            ids = jnp.clip(
                batch["sparse"][:, self.layout.sparse_index(c)], 0, int(n))
            cid = ids if cid is None else cid * (int(n) + 1) + ids
        return cid

    def _meta_params_per_example(self, p, batch):
        """Faithful path for multi-scenario-column: per-example [B, P]."""
        # gather ONLY the scenario columns (round-4 review: the full
        # lookup_sparse materialized [B, S, d] to keep 2 of S columns -
        # ~10x wasted gather bandwidth on the hot path)
        cols = [embeddings.lookup_field(
                    p["domain_bank"], self.layout, c,
                    batch["sparse"][:, self.layout.sparse_index(c)])
                for c in self.domain_cols]
        domain_emb = jnp.mean(jnp.stack(cols, axis=1), axis=1)  # [B, d]
        domain_emb = jax.nn.relu(domain_emb)
        L = self.domain_att_layer_num
        if not self.use_pos:
            vec = self._encode(p, domain_emb)
            per = {"Q": vec, "K": vec, "V": vec, "bilinear": vec}
            return [per] * L
        out = []
        b = domain_emb.shape[0]
        for layer_id in range(L):
            per = {}
            for qkv_id, name in enumerate(("Q", "K", "V")):
                pos = p["layerid_emb"][layer_id] + p["qkvid_emb"][qkv_id]
                all_emb = jnp.concatenate(
                    [domain_emb, jnp.broadcast_to(pos, (b, pos.shape[0]))], axis=-1)
                per[name] = self._encode(p, jax.nn.relu(all_emb))
            per["bilinear"] = per["Q"]
            out.append(per)
        return out

    # ------------------------------------------------------------------
    def apply(self, params, state, batch, *, train: bool = False, rng=None,
              return_scores: bool = False):
        p = params
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = embeddings.embed_fields(p["emb"], self.layout, batch)  # [B, F, d]
        cdtype = jnp.dtype(self.compute_dtype)

        single_col = len(self.domain_cols) == 1
        if single_col:
            domain_ids = batch["sparse"][
                :, self.layout.sparse_index(self.domain_cols[0])]
            tables = self._meta_param_tables(p)
            # clip once so every meta path agrees on out-of-range domain
            # ids: the gather fast path (w[dom]) clamps under jit while
            # one_hot(dom) would give an all-zero row (a silent no-op
            # transform) - clipping makes fused/dense_select/gather
            # predictions identical on the same data
            dom = jnp.clip(domain_ids, 0, self.num_domains)
        elif self.use_composite:
            # composite product-domain table: encoder over all combos,
            # then the single-column tabular machinery (incl. the fused
            # kernel) applies with R = prod(D_i+1) rows
            tables = self._tables_from_base(p, self._composite_base(p))
            dom = self._composite_ids(batch)
        else:
            tables = self._meta_params_per_example(p, batch)
            dom = None
        fused = self.use_fused_kernel
        blk = None
        if fused is None or fused:
            cands = (self.fused_block_b, 256, 128, 64, 32, 16)
            if self.use_composite and self.meta_rows > 8:
                # COMPOSITE product tables only (a single-column model
                # with many domains keeps its fused_block_b): wide
                # per-domain operands and the tiled dispatch's slack both
                # favor small tiles - 32 measured best
                # (bench/variant_matrix.py 'multicol', r5 sweep 16/32/64/128)
                cands = (int(os.environ.get("SATRANS_BLOCK_B_COMPOSITE",
                                            "32")), 16)
            for cand in cands:
                if x.shape[0] % cand == 0:
                    blk = cand
                    break
            # What the kernel supports: single scenario column, metanet
            # variant with ANY meta_mode (containment semantics: each of
            # Q/K is transformed iff its letter appears, reference
            # satrans.py:61-75 - so 'Query', the CLI default, runs Q-only
            # and 'QKV' is compute-identical to 'QK' because the reference
            # never meta-transforms V in the metanet variant; V_meta_mlp
            # is dead weight), shared AND 'pos' per-(layer,qkv) tables
            # (the kernel carries separate Q/K MetaNet weights+LNs),
            # optional relu-out ('relu' flag, reference satrans.py:91-92),
            # 2- or 3-matrix MetaNets ([d, h, d] or [d, h1, h2, d] units;
            # the middle matrix rides block-diagonally), no score return.
            # bf16 is fine (f32 internals; only layer boundaries narrow).
            # The 'gate'/'bilinear' variants ride their own lighter kernel
            # (ops/pallas/gate_block.py): same packed attention/out block,
            # scenario transform swapped for the per-domain gate (reference
            # satrans.py:61-66) resp. block-diagonal bilinear map
            # (satrans.py:79-81).
            # wide-operand bound: the masked-wide-GEMM kernels carry
            # [N, R*h] intermediates whose cost is linear in the table
            # rows R.  Composite metanet products instead ride the
            # DISPATCHED kernel (ops/pallas/tiled_meta.py + ops/dispatch):
            # sort-by-combo with per-tile capacity makes every kernel tile
            # single-domain, so the per-tile GEMMs are R-independent.
            max_h = max(self.meta_units[1:-1] or [self.meta_units[1]]) \
                if self.variant == "metanet" else self.layout.embedding_dim
            # masked-vs-tiled crossover for composite tables: the masked
            # wide GEMM costs ~R/(D+1)x the single-column meta FLOPs, the
            # dispatch costs slack rows + two permutes; measured crossover
            # recorded in bench/variant_matrix.py 'multicol_small*' rows
            tiled_min = int(os.environ.get("SATRANS_TILED_MIN_ROWS", "8"))
            tiled = (self.variant == "metanet" and not single_col
                     and self.meta_rows > tiled_min)
            common_ok = (dom is not None
                         and blk is not None
                         and cdtype in (jnp.float32, jnp.bfloat16))
            metanet_ok = (common_ok and self.variant == "metanet"
                          and len(self.meta_units) in (3, 4)
                          and (tiled or self.meta_rows * max_h <= 4096))
            simple_ok = (common_ok and self.variant in ("gate", "bilinear")
                         and (self.variant == "gate"
                              or self.meta_rows * max_h <= 4096))
            if return_scores:
                # Probe-mode (showattn/instattn) routing, MEASURED r5
                # (bench_results/probe_throughput_v5e_r5.json): probes run
                # under predict (no backward), where the XLA path does
                # 496.5k ex/s at the sota shapes - FASTER than the fused
                # score path (424.4k: stash writes of unused residuals +
                # the block-diagonal unpack, and a ~9 min compile).  The
                # r4 concern ("probes drop to the 164k path") conflated
                # the TRAIN-mode XLA rate with inference.  Default is
                # therefore XLA; SATRANS_PROBE_FUSED=1 opts into the
                # kernel's score output (equality-tested either way).
                probe_fused = (os.environ.get("SATRANS_PROBE_FUSED", "0")
                               == "1")
                metanet_ok = metanet_ok and not tiled and probe_fused
                simple_ok = False
            supported = metanet_ok or simple_ok
            # SATRANS_FUSED=0 disables auto mode; jax.default_backend() is
            # static under trace.
            if fused is None:
                fused = (supported and jax.default_backend() == "tpu"
                         and os.environ.get("SATRANS_FUSED", "1") != "0")
            else:
                # forced True still falls back transparently when the config
                # is outside the kernel's support (docstring contract)
                fused = fused and supported
        if fused:
            # weights stay f32 (the kernel computes in f32); only the
            # layer-boundary activations narrow under bf16 compute.
            from ..ops.pallas import gate_block, meta_block
            x = x.astype(cdtype)
            if tiled:
                # composite multi-column: dispatch into single-domain
                # tiles, per-tile weight blocks replace the one-hot
                # masked wide GEMM (D-independent cost; ~<=22% slack rows)
                from ..ops import dispatch as dsp
                from ..ops.pallas import tiled_meta
                plan = dsp.plan(dom, self.meta_rows, blk)
                x = dsp.scatter(x, plan)
                for i, layer_p in enumerate(p["layers"]):
                    seed = jax.random.randint(jax.random.fold_in(rng, i),
                                              (), 0, 2 ** 31 - 1,
                                              dtype=jnp.int32)
                    tile_tabs = {k: tables[i][k][plan.tile_dom]
                                 for k in ("Q", "K")}
                    x = tiled_meta.fused_tiled_layer_vjp(
                        x, layer_p, tile_tabs, meta_units=self.meta_units,
                        head_num=self.att_head_num,
                        drop_rate=self.dropout_rate, train=train,
                        seed=seed, block_b=blk,
                        interpret=self.fused_interpret,
                        relu_out=self.relu_out, mode=self.meta_mode)
                # head on the PADDED layout: only the scalar prediction
                # returns to batch order (gathering the [B, F, d] tensor
                # back would cost a 2x bigger permute + its backward
                # scatter; the head GEMM on slack rows is trivial)
                flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
                if self.layout.dense_dim > 0 and "dense" in batch:
                    flat = jnp.concatenate(
                        [flat, dsp.scatter(batch["dense"], plan)], axis=1)
                logit = core.linear_apply(params["head"], flat)
                pred = core.prediction(logit, self.task)[:, 0][plan.back]
                return pred, state, jnp.asarray(0.0)
            else:
                onehot = jax.nn.one_hot(dom, self.meta_rows,
                                        dtype=jnp.float32)
                all_scores = []
                for i, layer_p in enumerate(p["layers"]):
                    seed = jax.random.randint(jax.random.fold_in(rng, i),
                                              (), 0, 2 ** 31 - 1,
                                              dtype=jnp.int32)
                    if self.variant != "metanet":
                        x = gate_block.fused_simple_layer_vjp(
                            x, layer_p, tables[i], onehot,
                            variant=self.variant, mode=self.meta_mode,
                            head_num=self.att_head_num,
                            drop_rate=self.dropout_rate, train=train,
                            seed=seed, block_b=blk,
                            interpret=self.fused_interpret,
                            relu_out=self.relu_out)
                    elif return_scores:
                        x, scores = meta_block.fused_meta_layer_with_scores(
                            x, layer_p, tables[i], onehot,
                            meta_units=self.meta_units,
                            head_num=self.att_head_num,
                            drop_rate=self.dropout_rate, train=train,
                            seed=seed, block_b=blk,
                            interpret=self.fused_interpret,
                            relu_out=self.relu_out, mode=self.meta_mode)
                        all_scores.append(scores)
                    else:
                        x = meta_block.fused_meta_layer_vjp(
                            x, layer_p, tables[i], onehot,
                            meta_units=self.meta_units,
                            head_num=self.att_head_num,
                            drop_rate=self.dropout_rate, train=train,
                            seed=seed, block_b=blk,
                            interpret=self.fused_interpret,
                            relu_out=self.relu_out, mode=self.meta_mode)
            flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
            if self.layout.dense_dim > 0 and "dense" in batch:
                flat = jnp.concatenate([flat, batch["dense"]], axis=1)
            logit = core.linear_apply(params["head"], flat)
            pred = core.prediction(logit, self.task)[:, 0]
            if return_scores:
                return pred, state, jnp.asarray(0.0), all_scores
            return pred, state, jnp.asarray(0.0)

        if cdtype != jnp.float32:
            x = x.astype(cdtype)
            tables = jax.tree.map(lambda t: t.astype(cdtype), tables)
            p = dict(p)
            p["layers"] = jax.tree.map(lambda t: t.astype(cdtype), p["layers"])

        all_scores = []
        for i, layer_p in enumerate(p["layers"]):
            out = attention.meta_transformer_apply(
                layer_p, x, tables[i], self.meta_units,
                mode=self.meta_mode, head_num=self.att_head_num,
                variant=self.variant, relu_out=self.relu_out,
                dropout_rate=self.dropout_rate, train=train,
                rng=jax.random.fold_in(rng, i), domain_ids=dom,
                # dense-select runs one GEMM PER table row - profitable
                # for a handful of scenario ids, pathological for
                # composite product tables (R GEMMs); gather instead
                dense_select=self.dense_select and self.meta_rows <= 8,
                return_scores=return_scores)
            if return_scores:
                x, scores = out
                all_scores.append(scores)
            else:
                x = out

        flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
        if self.layout.dense_dim > 0 and "dense" in batch:
            flat = jnp.concatenate([flat, batch["dense"]], axis=1)
        logit = core.linear_apply(params["head"], flat)
        pred = core.prediction(logit, self.task)[:, 0]
        if return_scores:
            return pred, state, jnp.asarray(0.0), all_scores
        return pred, state, jnp.asarray(0.0)

    # ------------------------------------------------------------------
    def reg_loss(self, params):
        # Embedding L2 only (l2_reg_linear=0 and no linear model here,
        # reference satrans.py:120-122 + basemodel.py:180).  The secondary
        # domain bank is NOT registered for L2 in the reference (it is created
        # after add_regularization_weight runs, satrans.py:186-188).
        return embeddings.l2_loss(params["emb"], self.l2_reg_embedding)
