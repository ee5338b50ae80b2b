from pynndescent_tpu.utils import rng  # noqa: F401
from pynndescent_tpu.utils import graph_utils  # noqa: F401
