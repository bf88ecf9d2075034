"""Ortho-normalized Fourier transforms over the spatial axes.

TPU-native counterpart of `simulator/src/utils/fft.rs:6-98`: the reference
scales ArrayFire FFTs by 1/N^(d/2) in both directions, which is exactly
numpy/JAX ``norm="ortho"``. The spatial axes are always the *last* ``dims``
axes, so any leading axes (the stream ensemble batch) are batched for free.

Two backends:

- ``xla``: `jnp.fft.fftn` (XLA's FFT lowering).
- ``matmul``: the DFT evaluated as one (N, N) matrix contraction per axis.
  A TPU has no FFT unit but a 128x128 systolic MXU; for the grid sizes this
  engine targets (N <= 512) the O(N) matmul DFT beats the O(log N) FFT
  lowering because it runs at MXU rather than VPU throughput. Precomputed
  per-size DFT matrices are closure constants; accuracy is ~sqrt(N)*eps per
  transform (comparable to the f32 FFT's accumulated pass error — validated
  in tests).

`set_default_mode` / the MSM_FFT env var select the backend; the
mesh-sharded pencil FFT lives in ``msm_tpu.parallel.pfft``.
"""

from __future__ import annotations

import functools
import math
import os

import jax.numpy as jnp
import numpy as np

# Default 'xla'. 'auto' resolves to matmul on TPU backends for sizes up to
# _MATMUL_MAX_SIZE: measured at 256^3 c64 the two are speed-equal (27.0 vs
# 27.3 ms/step) but the f32 matmul-DFT at HIGHEST precision leaves a
# spectral noise floor ~4 orders of magnitude below the XLA FFT's
# (alias-band mass 5e-16 vs 3e-12 after 40 steps). matmul is not the
# default because the remote AOT compiler's time on matmul-heavy step
# graphs is erratic (minutes to indefinite when combined with lax.cond).
_MODE = os.environ.get("MSM_FFT", "xla")
_MATMUL_MAX_SIZE = 256


def set_default_mode(mode: str) -> None:
    """Select the transform backend: 'auto', 'xla', 'matmul' or 'mxu'."""
    assert mode in ("auto", "xla", "matmul", "mxu")
    global _MODE
    _MODE = mode


def _resolve(size: int) -> str:
    from . import mxu_fft

    if _MODE == "mxu":
        return "mxu" if mxu_fft.supported(size) else "xla"
    if _MODE != "auto":
        return _MODE
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        # the Pallas CT-matmul FFT owns every 128*R size; the full-DFT
        # matmul remains for small odd sizes it cannot leaf
        if mxu_fft.supported(size):
            return "mxu"
        if size <= _MATMUL_MAX_SIZE:
            return "matmul"
    return "xla"


def get_mode(size: int = 1 << 30) -> str:
    return _resolve(size)


def _spatial_axes(dims: int) -> tuple[int, ...]:
    return tuple(range(-dims, 0))


@functools.lru_cache(maxsize=None)
def _dft_matrix(size: int, inverse: bool, rdtype_name: str) -> np.ndarray:
    """Ortho DFT matrix W[j, k] = exp(-+2*pi*i*j*k / N) / sqrt(N).

    Cached as NUMPY data (a cached jnp array would leak the trace it was
    first constantified in); each jit trace embeds its own constant.
    """
    j = np.arange(size)
    sign = 2.0j if inverse else -2.0j
    w = np.exp(sign * np.pi * np.outer(j, j) / size) / math.sqrt(size)
    cdtype = np.complex64 if rdtype_name == "float32" else np.complex128
    return w.astype(cdtype)


# Radix for the factorized (Cooley-Tukey) matmul transform: the first
# stage contracts exactly one MXU tile width.
_CT_RADIX = 128


@functools.lru_cache(maxsize=None)
def _ct_factors(size: int, inverse: bool, rdtype_name: str):
    """(W1, twiddle, W2) for the split size = N1 * N2 with N1 = 128.

    Decimation-in-time with n = N2*n1 + n2, k = N1*k2 + k1:
      X[k] = sum_n2 e^{-2pi i n2 k2/N2} * T[n2,k1] * sum_n1 x[N2 n1+n2] W1[n1,k1]
    with T[n2,k1] = e^{-2pi i n2 k1 / N}. Ortho norm split across W1/W2.
    """
    n1, n2 = _CT_RADIX, size // _CT_RADIX
    cdtype = np.complex64 if rdtype_name == "float32" else np.complex128
    sign = 2.0j if inverse else -2.0j
    j1 = np.arange(n1)
    w1 = np.exp(sign * np.pi * np.outer(j1, j1) / n1) / math.sqrt(n1)
    j2 = np.arange(n2)
    w2 = np.exp(sign * np.pi * np.outer(j2, j2) / n2) / math.sqrt(n2)
    tw = np.exp(sign * np.pi * np.outer(j2, j1) / size)  # T[n2, k1]
    return w1.astype(cdtype), tw.astype(cdtype), w2.astype(cdtype)


def _ct_axis(psi: jnp.ndarray, lead: int, size: int, inverse: bool, rname: str):
    """Transform axis `lead` by factorized matmuls; result axis lands LAST."""
    import jax

    hi = jax.lax.Precision.HIGHEST
    n1, n2 = _CT_RADIX, size // _CT_RADIX
    w1, tw, w2 = _ct_factors(size, inverse, rname)
    shape = psi.shape
    # split the axis: n = N2*n1 + n2 -> row-major (n1, n2)
    psi = psi.reshape(shape[:lead] + (n1, n2) + shape[lead + 1 :])
    # stage 1: contract n1 (full MXU tile); k1 appended last
    psi = jnp.tensordot(psi, w1, axes=[[lead], [0]], precision=hi)
    # twiddle T[n2, k1]: n2 now sits at `lead`, k1 last
    t = tw.reshape((n2,) + (1,) * (psi.ndim - lead - 2) + (n1,))
    psi = psi * t
    # stage 2: contract n2; k2 appended last -> (..., k1, k2)
    psi = jnp.tensordot(psi, w2, axes=[[lead], [0]], precision=hi)
    # k = N1*k2 + k1 -> need (k2, k1) order before flattening
    psi = jnp.swapaxes(psi, -1, -2)
    return psi.reshape(psi.shape[: psi.ndim - 2] + (size,))


def _matmul_transform(psi: jnp.ndarray, dims: int, inverse: bool) -> jnp.ndarray:
    """Per-axis DFT as MXU matmuls, zero explicit transposes.

    Each round contracts the current LEADING spatial axis and appends the
    transformed axis at the end; after `dims` rounds the cyclic appends
    restore exactly the canonical axis order ((z,y,x) -> (y,x,kz) ->
    (x,kz,ky) -> (kz,ky,kx)). Sizes that factor as 128*N2 use the
    Cooley-Tukey two-stage form (a full-width 128 contraction + a small
    one + twiddles: ~(128+N2)/N of the full-DFT flops). HIGHEST precision
    keeps the MXU in f32 (the TPU default would compute in bf16 — a 1e-2
    relative error, unusable for unitary evolution).
    """
    import jax

    rname = "float32" if psi.dtype == jnp.complex64 else "float64"
    size = psi.shape[-1]
    use_ct = size > _CT_RADIX and size % _CT_RADIX == 0
    w = None if use_ct else _dft_matrix(size, inverse, rname)
    for _ in range(dims):
        lead = psi.ndim - dims
        if use_ct:
            psi = _ct_axis(psi, lead, size, inverse, rname)
        else:
            psi = jnp.tensordot(
                psi, w, axes=[[lead], [0]], precision=jax.lax.Precision.HIGHEST
            )
    return psi


def forward(psi: jnp.ndarray, dims: int) -> jnp.ndarray:
    """psi(x) -> psi(k), unitary normalization (fft.rs:6-30)."""
    mode = _resolve(psi.shape[-1])
    if mode == "matmul":
        return _matmul_transform(psi, dims, inverse=False)
    if mode == "mxu":
        from . import mxu_fft

        return mxu_fft.forward(psi, dims)
    return jnp.fft.fftn(psi, axes=_spatial_axes(dims), norm="ortho")


def inverse(psik: jnp.ndarray, dims: int) -> jnp.ndarray:
    """psi(k) -> psi(x), unitary normalization (fft.rs:32-57)."""
    mode = _resolve(psik.shape[-1])
    if mode == "matmul":
        return _matmul_transform(psik, dims, inverse=True)
    if mode == "mxu":
        from . import mxu_fft

        return mxu_fft.inverse(psik, dims)
    return jnp.fft.ifftn(psik, axes=_spatial_axes(dims), norm="ortho")
