from . import meta_block

__all__ = ["meta_block"]
