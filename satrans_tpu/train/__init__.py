from . import callbacks, losses, metrics
from .trainer import DomainRouted, SingleTask, Trainer

__all__ = ["DomainRouted", "SingleTask", "Trainer", "callbacks", "losses",
           "metrics"]
