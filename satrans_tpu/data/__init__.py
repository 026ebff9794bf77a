from . import aliccp, alimama, io, loader, synthetic

__all__ = ["aliccp", "alimama", "io", "loader", "synthetic"]
