from . import attention, core, initializers, interactions, metanet

__all__ = ["attention", "core", "initializers", "interactions", "metanet"]
