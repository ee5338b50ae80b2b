from pynndescent_tpu.models.nndescent import NNDescent  # noqa: F401
