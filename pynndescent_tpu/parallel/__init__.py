from pynndescent_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sharded_nn_descent,
    sharded_search,
)
