from .satrans import SATrans

__all__ = ["SATrans"]
