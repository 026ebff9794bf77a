from . import segment

__all__ = ["segment"]
