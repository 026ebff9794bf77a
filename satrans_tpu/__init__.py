"""satrans_tpu: TPU-native multi-domain CTR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
qwerfdsaplking/SATrans (KDD'23) - scenario-adaptive feature interaction for
click-through-rate prediction - designed TPU-first: fused embedding banks,
one jitted optimizer step, device-mesh data parallelism, and per-domain
hypernetwork evaluation.

See SURVEY.md at the repo root for the reference layer map this rebuild
covers, and README.md for usage.
"""

from . import embeddings, features, nn
from .features import (DenseFeature, FeatureLayout, SparseFeature,
                       VarLenSparseFeature)

__version__ = "0.1.0"

__all__ = [
    "DenseFeature", "FeatureLayout", "SparseFeature", "VarLenSparseFeature",
    "embeddings", "features", "nn",
]
