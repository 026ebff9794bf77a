"""Checkpoint save/restore (orbax).

The reference only supports a post-training ``torch.save(state_dict)`` with
no load path (``--finetune`` is parsed but never read, main.py:57, 399-401;
SURVEY.md section 5).  This module adds full save/RESUME of params +
optimizer state + mutable state as new capability.
"""

from __future__ import annotations

import os


def save(path: str, trainer) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": trainer.params, "opt_state": trainer.opt_state,
               "state": trainer.state}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore(path: str, trainer) -> None:
    """Restore in-place into an initialized trainer (shapes must match)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    trainer._ensure_initialized()
    template = {"params": trainer.params, "opt_state": trainer.opt_state,
                "state": trainer.state}
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, template)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, abstract)
    trainer.params = restored["params"]
    trainer.opt_state = restored["opt_state"]
    trainer.state = restored["state"]
