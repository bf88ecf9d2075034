"""Complex-safe host<->device transfers.

The axon TPU backend (single tunneled chip) implements device<->host
transfers only for real dtypes — moving a complex64 array in either
direction raises UNIMPLEMENTED. These helpers move complex data as two
real planes and (re)assemble on the correct side: `lax.complex` in-jit on
upload, numpy on download. They are no-ops worth of overhead on backends
with native complex transfer, so they are used unconditionally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def device_get_complex(z) -> np.ndarray:
    """Fetch a complex device array to host via two real transfers."""
    re, im = _split(z)
    re_np = np.asarray(re)
    return (re_np + 1j * np.asarray(im)).astype(
        np.complex64 if re_np.dtype == np.float32 else np.complex128
    )


def device_put_complex(arr: np.ndarray, dtype=jnp.complex64) -> jax.Array:
    """Upload a host complex array via two real transfers + in-jit combine."""
    rdtype = np.float32 if jnp.dtype(dtype) == jnp.complex64 else np.float64
    arr = np.asarray(arr)
    re = np.ascontiguousarray(arr.real, dtype=rdtype)
    im = np.ascontiguousarray(arr.imag, dtype=rdtype)
    return _combine(re, im)
