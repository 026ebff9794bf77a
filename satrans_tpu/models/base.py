"""Model protocol: config objects with pure ``init``/``apply``.

Every model in :mod:`satrans_tpu.models` is a plain-Python config class with

* ``init(key) -> (params, state)``  - params: trainable pytree; state:
  non-trainable pytree (BatchNorm running stats; ``{}`` when unused)
* ``apply(params, state, batch, *, train, rng) -> (pred, new_state, aux_loss)``
  - ``pred`` is ``[B]`` (single-task, post-sigmoid) or ``[B, T]`` (MTL);
  ``aux_loss`` is a scalar added to the training loss (reference
  basemodel.py:537-538 ``add_auxiliary_loss``)
* ``reg_loss(params) -> scalar`` - the L2 regularization term the reference
  accumulates via ``add_regularization_weight`` (basemodel.py:509-535)

The config object itself is static (captured by closure under ``jit``);
everything traced flows through params/state/batch.

This single protocol replaces the reference's three near-identical training
base classes (basemodel.py / meta_basemodel.py / mtl_basemodel.py) - engine
differences (loss masking, per-domain predict routing) live in
:mod:`satrans_tpu.train` strategies instead.
"""

from __future__ import annotations

from typing import Any, Protocol


class Model(Protocol):
    task: str

    def init(self, key) -> tuple[Any, Any]: ...

    def apply(self, params, state, batch, *, train: bool = False, rng=None
              ) -> tuple[Any, Any, Any]: ...

    def reg_loss(self, params): ...


class DomainAwareModel(Model, Protocol):
    """Models that route by a scenario/domain column (STAR, MTL heads).

    ``domain_id_offset`` maps raw domain ids to 0-based branch indices; the
    reference learns it from the training data (meta_basemodel.py:218,
    mtl_basemodel.py:160) - the Trainer calls ``set_domain_offset`` before
    compiling the train step.
    """

    def set_domain_offset(self, offset: int) -> None: ...
