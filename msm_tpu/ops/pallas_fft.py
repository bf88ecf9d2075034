"""Pallas Stockham FFT: all log2(N) butterfly passes in VMEM.

XLA's TPU FFT lowering costs ~8 ms per 3-D transform at 256^3 — roughly 12%
of what pure HBM traffic would allow (read + write once per axis pass).
This kernel streams (N, LB)-shaped tiles of the grid through VMEM and runs
the entire radix-2 Stockham decimation-in-time ladder on-chip, so each
1-D axis pass over the grid costs exactly one HBM read + one write.

Layouts (complex as separate real/imag f32 planes):

- `_fft_mid_kernel`: transforms the MIDDLE axis of a (pre, N, post) view;
  blocks are (1, N, LB) with LB lanes of the trailing dims. Used for every
  spatial axis except the last.
- `_fft_last_kernel`: transforms the LAST axis; blocks are (RB, N) rows,
  transposed to (N, RB) inside VMEM (vreg shuffles), laddered, transposed
  back.

Twiddles for every stage are embedded as small per-stage constants
(sum_t 2^t = N complex values — trivial next to the data). Ortho
normalization is folded into the final stage. Grid sizes must be powers of
two with N >= 2 and the trailing block dimensions multiples of 128.

Exposed through `msm_tpu.ops.fft` as mode "pallas".
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def eligible(size: int) -> bool:
    return size >= 2 and (size & (size - 1)) == 0


def _ladder(re, im, size: int, inverse: bool, norm: float, rdtype_name: str):
    """Full Stockham DIT ladder over axis 0 of (N, LB) value arrays.

    Twiddles are synthesized per stage from iota (pallas kernels cannot
    capture array constants): w_t[j] = exp(-+pi i j / l_t), l_t = 2^t.
    """
    dt = jnp.float32 if rdtype_name == "float32" else jnp.float64
    sign = 1.0 if inverse else -1.0
    l = 1
    while l < size:
        m = size // (2 * l)
        # view as (2, m, l, LB): first axis = parity of the decimation
        re2 = re.reshape(2, m, l, -1)
        im2 = im.reshape(2, m, l, -1)
        er, ei = re2[0], im2[0]
        orr, oi = re2[1], im2[1]
        if l == 1:
            # w_1 = [1]: no twiddle on the first stage (and Mosaic rejects
            # the degenerate 1-element iota anyway)
            tr, ti = orr, oi
        else:
            j = jax.lax.broadcasted_iota(jnp.int32, (1, l, 1), 1).astype(dt)
            ang = j * (sign * math.pi / l)
            twr = jnp.cos(ang)
            twi = jnp.sin(ang)
            tr = orr * twr - oi * twi
            ti = orr * twi + oi * twr
        # out viewed as (m, 2, l, LB)
        re = jnp.stack([er + tr, er - tr], axis=1).reshape(size, -1)
        im = jnp.stack([ei + ti, ei - ti], axis=1).reshape(size, -1)
        l *= 2
    if norm != 1.0:
        re = re * norm
        im = im * norm
    return re, im


def _fft_mid_kernel(re_ref, im_ref, ore_ref, oim_ref, *, size, inverse, rname):
    norm = 1.0 / math.sqrt(size)
    re = re_ref[0]
    im = im_ref[0]
    re, im = _ladder(re, im, size, inverse, norm, rname)
    ore_ref[0] = re
    oim_ref[0] = im


def _fft_last_kernel(re_ref, im_ref, ore_ref, oim_ref, *, size, inverse, rname):
    norm = 1.0 / math.sqrt(size)
    re = re_ref[...].T  # (RB, N) -> (N, RB), in-VMEM transpose
    im = im_ref[...].T
    re, im = _ladder(re, im, size, inverse, norm, rname)
    ore_ref[...] = re.T
    oim_ref[...] = im.T


_LB = 512  # lanes per mid-axis block
_RB = 256  # rows per last-axis block


def _transform_axis(re, im, axis_from_end: int, size: int, inverse: bool):
    """Transform one axis of the (..., N, ..., N) planes."""
    rname = "float32" if re.dtype == jnp.float32 else "float64"
    shape = re.shape
    axis = re.ndim - 1 - axis_from_end

    if axis_from_end == 0:
        # last axis: (pre2, N) view, blocks (RB, N)
        pre = int(np.prod(shape[:-1]))
        rb = min(_RB, pre)
        while pre % rb:
            rb //= 2
        view = (pre, size)
        grid = (pre // rb,)
        block = (rb, size)
        index_map = lambda i: (i, 0)
        kernel = functools.partial(
            _fft_last_kernel, size=size, inverse=inverse, rname=rname
        )
    else:
        pre = int(np.prod(shape[:axis])) if axis else 1
        post = int(np.prod(shape[axis + 1 :]))
        lb = min(_LB, post)
        while post % lb:
            lb //= 2
        view = (pre, size, post)
        grid = (pre, post // lb)
        block = (1, size, lb)
        index_map = lambda i, j: (i, 0, j)
        kernel = functools.partial(
            _fft_mid_kernel, size=size, inverse=inverse, rname=rname
        )

    spec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(view, re.dtype),
            jax.ShapeDtypeStruct(view, re.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(re.reshape(view), im.reshape(view))
    return out[0].reshape(shape), out[1].reshape(shape)


@functools.partial(jax.jit, static_argnames=("dims", "inverse"))
def fftn_pallas(z: jax.Array, dims: int, inverse: bool = False) -> jax.Array:
    """Ortho n-dim FFT over the trailing `dims` axes via the VMEM ladder."""
    size = z.shape[-1]
    assert eligible(size), size
    re = jnp.real(z)
    im = jnp.imag(z)
    for axis_from_end in range(dims):
        re, im = _transform_axis(re, im, axis_from_end, size, inverse)
    return jax.lax.complex(re, im)
