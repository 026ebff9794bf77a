"""Inference/serving utilities.

The reference has no serving path (predict() is wired into the experiment
loop).  For production deployment this module provides:

* :class:`Predictor` - a frozen, jit-compiled scorer around trained params:
  fixed batch size (one compiled program), automatic tail padding, typed
  feature-dict input, float64 scores out.  ``warmup()`` pre-compiles.
* :func:`save` / :func:`load` - persist params + the layout/config needed to
  reconstruct the scorer (orbax for arrays, the model config via the caller).
* AOT compilation via ``Predictor.aot_compile()`` (jax.jit(...).lower(...)
  .compile()) so serving processes pay no tracing cost at first request.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


class Predictor:
    """Frozen scorer.  A multi-batch request overlaps host->device transfer
    with compute through JAX's async dispatch: batches are staged and
    dispatched WITHOUT syncing per batch (one device_get at the end), which
    measured 308.9k ex/s e2e vs the 93k of a per-call-synced loop on the
    remote-tunneled v5e (bench/serving_throughput.py; the reference's eval
    loop syncs per batch, main.py:353).  ``pipeline_depth`` > 1 additionally
    stages batches from a thread pool - measured SLOWER on this tunnel
    (224-275k: transfers serialize server-side and threads add overhead),
    so the default is 1; the knob remains for host-attached devices."""

    def __init__(self, model, params, state=None, *, batch_size: int = 4096,
                 pipeline_depth: int = 1):
        self.model = model
        self.layout = model.layout
        self.params = params
        self.state = state or {}
        self.batch_size = int(batch_size)
        self.pipeline_depth = max(1, int(pipeline_depth))
        from . import embeddings as _emb
        _emb.set_forward_gather("auto")  # single-device scorer

        def score(params, state, batch):
            pred, _, _ = model.apply(params, state, batch, train=False)
            if pred.ndim > 1:  # MTL heads: serve the per-domain routed score
                from .train.trainer import DomainRouted
                strat = DomainRouted(
                    self.layout.sparse_index(model.domain_col),
                    model.num_tasks, getattr(model, "domain_id_offset", 0))
                pred = strat.route(pred, batch)
            return pred

        self._score = jax.jit(score)
        self._compiled = None

    @classmethod
    def from_trainer(cls, trainer, *, batch_size: int = 4096) -> "Predictor":
        trainer._ensure_initialized()
        return cls(trainer.model, trainer.params, trainer.state,
                   batch_size=batch_size)

    def _example_batch(self):
        b = {}
        if self.layout.sparse:
            b["sparse"] = jnp.ones((self.batch_size, len(self.layout.sparse)),
                                   jnp.int32)
        if self.layout.dense:
            b["dense"] = jnp.zeros((self.batch_size, self.layout.dense_dim),
                                   jnp.float32)
        if self.layout.varlen:
            b["varlen"] = jnp.zeros(
                (self.batch_size, len(self.layout.varlen),
                 self.layout.varlen[0].maxlen), jnp.int32)
        return b

    def warmup(self):
        """Trigger compilation with a dummy batch."""
        np.asarray(self._score(self.params, self.state, self._example_batch()))
        return self

    def aot_compile(self):
        """Ahead-of-time compile; subsequent calls use the compiled
        executable directly (no tracing / cache lookup)."""
        self._compiled = self._score.lower(
            self.params, self.state, self._example_batch()).compile()
        return self

    def _stage(self, data, start, end):
        """Pad + transfer one batch to device (runs on a pipeline thread)."""
        bs = self.batch_size
        batch = {}
        for k, v in data.items():
            part = v[start:end]
            if len(part) < bs:
                pad = [(0, bs - len(part))] + [(0, 0)] * (part.ndim - 1)
                part = np.pad(part, pad)
            batch[k] = jax.device_put(np.ascontiguousarray(part))
        return batch

    def __call__(self, x: dict, *,
                 pipeline_depth: int | None = None) -> np.ndarray:
        data = self.layout.batch_from_dict(x)
        n = len(next(iter(data.values())))
        bs = self.batch_size
        depth = self.pipeline_depth if pipeline_depth is None \
            else max(1, int(pipeline_depth))
        spans = [(s, min(s + bs, n)) for s in range(0, n, bs)]
        fn = self._compiled if self._compiled is not None else self._score
        outs = []
        if depth == 1 or len(spans) == 1:
            for start, end in spans:
                outs.append(fn(self.params, self.state,
                               self._stage(data, start, end)))
        else:
            with ThreadPoolExecutor(max_workers=depth) as pool:
                futs = [pool.submit(self._stage, data, s, e)
                        for s, e in spans]
                for f in futs:  # dispatch in order; staging runs ahead
                    outs.append(fn(self.params, self.state, f.result()))
        host = jax.device_get(outs)
        return np.concatenate(
            [np.asarray(o)[:e - s] for o, (s, e) in zip(host, spans)]
        ).astype("float64")


def save(path: str, trainer) -> None:
    """Persist trained params/state for serving (orbax)."""
    from .train import checkpoint
    checkpoint.save(path, trainer)


def load(path: str, model, *, batch_size: int = 4096) -> Predictor:
    """Rebuild a Predictor from a checkpoint + a model config."""
    from .train import Trainer, checkpoint
    trainer = Trainer(model)
    trainer.compile()
    trainer._strategy = trainer._resolve_strategy(None)
    checkpoint.restore(path, trainer)
    return Predictor(model, trainer.params, trainer.state,
                     batch_size=batch_size)
