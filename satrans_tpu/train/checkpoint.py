"""Checkpoint save/restore (orbax).

The reference only supports a post-training ``torch.save(state_dict)`` with
no load path (``--finetune`` is parsed but never read, main.py:57, 399-401;
SURVEY.md section 5).  This module adds full save/RESUME of params +
optimizer state + mutable state as new capability.
"""

from __future__ import annotations

import os


import numpy as np

_NO_OFFSET = -(2 ** 31)  # sentinel: model has no fit-learned domain offset


def save(path: str, trainer) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    # Fit-learned config travels with the weights: the domain_id_offset is
    # learned from the training data (reference meta_basemodel.py:218,
    # mtl_basemodel.py:160) and MTL head routing is wrong without it -
    # a restored model must not fall back to the config-default offset.
    offset = getattr(trainer.model, "domain_id_offset", None)
    payload = {"params": trainer.params, "opt_state": trainer.opt_state,
               "state": trainer.state,
               "meta": {"domain_id_offset": np.int32(
                   _NO_OFFSET if offset is None else int(offset))}}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore(path: str, trainer) -> None:
    """Restore in-place into an initialized trainer (shapes must match).

    Also restores fit-learned model config (domain_id_offset) so routed
    prediction works without refitting.
    """
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    trainer._ensure_initialized()
    template = {"params": trainer.params, "opt_state": trainer.opt_state,
                "state": trainer.state,
                "meta": {"domain_id_offset": np.int32(0)}}
    ckptr = ocp.StandardCheckpointer()

    def _restore(tmpl):
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, tmpl)
        return ckptr.restore(path, abstract)

    try:
        restored = _restore(template)
    except (ValueError, KeyError):
        # checkpoints written before the 'meta' group existed: restore the
        # original structure, keep the model's config-default offset
        del template["meta"]
        restored = _restore(template)
    trainer.params = restored["params"]
    trainer.opt_state = restored["opt_state"]
    trainer.state = restored["state"]
    offset = int(restored.get("meta", {}).get("domain_id_offset", _NO_OFFSET))
    if offset != _NO_OFFSET and hasattr(trainer.model, "set_domain_offset"):
        trainer.model.set_domain_offset(offset)
