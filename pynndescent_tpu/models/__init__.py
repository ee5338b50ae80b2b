from pynndescent_tpu.models.nndescent import NNDescent  # noqa: F401
from pynndescent_tpu.models.transformer import PyNNDescentTransformer  # noqa: F401
