from pynndescent_tpu.ops import distances  # noqa: F401
from pynndescent_tpu.ops import optimal_transport  # noqa: F401

distances._register_ot_metrics()
