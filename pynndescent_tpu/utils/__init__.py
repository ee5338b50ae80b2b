from pynndescent_tpu.utils import rng  # noqa: F401
