"""Host->device transfer helpers.

Measured on the tunneled v5e: a monolithic 205 MB ``jnp.asarray`` takes
~180 s while the same array in 16-64 MB row chunks transfers in ~5 s (the
transport degrades non-linearly on large single transfers). Every bulk
upload in the library goes through ``to_device_chunked``; small arrays pass
straight through.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_CHUNK_BYTES = 32 << 20


def to_device_chunked(arr, chunk_bytes: int = _CHUNK_BYTES):
    """Upload a host array to the default device in row chunks."""
    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr)  # already on device (or scalar/list)
    row_bytes = int(arr.itemsize * int(np.prod(arr.shape[1:], dtype=np.int64)))
    if arr.ndim < 1 or arr.nbytes <= chunk_bytes or row_bytes > chunk_bytes:
        return jnp.asarray(arr)
    rows = max(1, chunk_bytes // row_bytes)
    parts = [jnp.asarray(arr[i : i + rows]) for i in range(0, arr.shape[0], rows)]
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)
