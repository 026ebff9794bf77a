from . import gate_block, meta_block

__all__ = ["gate_block", "meta_block"]
