"""pynndescent_tpu — a TPU-native approximate-nearest-neighbor framework.

Re-implements the full capability surface of ``lmcinnes/pynndescent``
(NN-descent k-NN graph construction, RP-forest initialisation, diversified
search-graph queries, incremental updates, quantization, a large metric
registry, and a scikit-learn compatible transformer) designed from scratch
for TPUs on JAX/XLA/Pallas.
"""

__version__ = "0.1.0"

from pynndescent_tpu import ops, utils  # noqa: F401

# Public API (populated as the index layer lands):
try:  # pragma: no cover - import-time wiring
    from pynndescent_tpu.models.nndescent import NNDescent  # noqa: F401
    from pynndescent_tpu.models.transformer import PyNNDescentTransformer  # noqa: F401

    __all__ = ["NNDescent", "PyNNDescentTransformer"]
except ImportError:  # models layer not built yet
    __all__ = []
