from pynndescent_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    sharded_nn_descent,
    sharded_search,
)
