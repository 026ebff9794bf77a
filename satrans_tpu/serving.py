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

import numpy as np

import jax
import jax.numpy as jnp


class Predictor:
    def __init__(self, model, params, state=None, *, batch_size: int = 4096):
        self.model = model
        self.layout = model.layout
        self.params = params
        self.state = state or {}
        self.batch_size = int(batch_size)

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

    def __call__(self, x: dict) -> np.ndarray:
        data = self.layout.batch_from_dict(x)
        n = len(next(iter(data.values())))
        bs = self.batch_size
        outs = []
        sizes = []
        for start in range(0, n, bs):
            end = min(start + bs, n)
            batch = {}
            for k, v in data.items():
                part = v[start:end]
                if len(part) < bs:
                    pad = [(0, bs - len(part))] + [(0, 0)] * (part.ndim - 1)
                    part = np.pad(part, pad)
                batch[k] = jnp.asarray(part)
            fn = self._compiled if self._compiled is not None else self._score
            outs.append(fn(self.params, self.state, batch))
            sizes.append(end - start)
        host = jax.device_get(outs)
        return np.concatenate(
            [np.asarray(o)[:b] for o, b in zip(host, sizes)]).astype("float64")


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
