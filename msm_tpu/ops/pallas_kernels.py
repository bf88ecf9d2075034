"""Hand-fused Pallas TPU kernels for the KDK hot loop.

The memory-bound interludes between FFTs are elementwise passes over the
complex grid (`simulator/src/simulation_object.rs:504-516,535-545,1076-1102`).
The jnp versions are already XLA-fused into single VPU loops; the kernels
here additionally *synthesize the k-grid from block indices in-register*, so
the kinetic phase rotation and the Poisson k^-2 multiply never read the
spec_grid array from HBM at all — saving a full f32 grid read per call:

  kinetic_phase    : z <- z * exp(i * scale * q^2),  q^2 from iota
  poisson_multiply : rho_k <- scale * rho_k / q^2 (zero mode -> 0), q^2 from iota
  phase_rotate     : z <- z * exp(i * coeff * field) (generic, field loaded)

All kernels operate on (B, *grid) with a per-stream scalar coefficient in
SMEM (scalar prefetch), processing one z-plane (3-D) or one stream (2-D)
per grid step. Complex arrays travel as separate real/imag f32 planes
(TPU Pallas has no native complex dtype).

Eligibility: cube grids, dims in {2, 3}, X a multiple of 128 and Y of 8
(f32 tiling); callers fall back to the jnp path otherwise
(`msm_tpu.ops.phase`). Kernels run in interpret mode off-TPU so the same
code path is testable on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def eligible(shape: tuple[int, ...], dims: int) -> bool:
    """Whether the fused kernels support this grid."""
    if dims not in (2, 3):
        return False
    size = shape[-1]
    if any(s != size for s in shape[-dims:]):
        return False
    return size % 128 == 0


def _freq_sq_plane(size: int, dtype):
    """(q_y^2 + q_x^2) for one (size, size) plane, from iota (no HBM read).

    q(i) = i for i < size/2 else i - size — the integer fftfreq numerator
    (`simulator/src/utils/fft.rs:100-120`).
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    half = size // 2
    qy = jnp.where(row < half, row, row - size).astype(dtype)
    qx = jnp.where(col < half, col, col - size).astype(dtype)
    return qy * qy + qx * qx


def _qz(zi, size: int, dtype):
    half = size // 2
    return jnp.where(zi < half, zi, zi - size).astype(dtype)


# ---------------------------------------------------------------------------
# kinetic_phase: z *= exp(i * scale * q^2)
# ---------------------------------------------------------------------------


def _kinetic_kernel(scale_ref, re_ref, im_ref, ore_ref, oim_ref, *, size, dims):
    b = pl.program_id(0)
    scale = scale_ref[b]
    q2 = _freq_sq_plane(size, re_ref.dtype)
    if dims == 3:
        qz = _qz(pl.program_id(1), size, re_ref.dtype)
        q2 = q2 + qz * qz
    theta = scale * q2
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    re = re_ref[...].reshape(size, size)
    im = im_ref[...].reshape(size, size)
    ore_ref[...] = (re * c - im * s).reshape(ore_ref.shape)
    oim_ref[...] = (re * s + im * c).reshape(oim_ref.shape)


@functools.partial(jax.jit, static_argnames=("size", "dims"))
def kinetic_phase(z: jax.Array, scale: jax.Array, size: int, dims: int) -> jax.Array:
    """z * exp(i * scale_b * q^2) with q^2 built from indices in-kernel.

    ``scale`` has shape (B,) = coeff_b * (2*pi / (size*dx))^2, i.e. the
    per-stream kinetic coefficient with the physical k-grid scaling folded
    in (theta = coeff * k^2, k^2 = (2*pi/(N dx))^2 * q^2).
    """
    rdtype = jnp.finfo(z.dtype).dtype
    batch = z.shape[0]
    grid = (batch, size) if dims == 3 else (batch,)
    if dims == 3:
        block = (1, 1, size, size)
        index_map = lambda b, zi, _s: (b, zi, 0, 0)
    else:
        block = (1, size, size)
        index_map = lambda b, _s: (b, 0, 0)

    spec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kinetic_kernel, size=size, dims=dims),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(z.shape, rdtype),
            jax.ShapeDtypeStruct(z.shape, rdtype),
        ],
        interpret=_interpret(),
    )(scale.astype(rdtype), jnp.real(z), jnp.imag(z))
    return jax.lax.complex(out[0], out[1])


# ---------------------------------------------------------------------------
# poisson_multiply: rho_k -> scale * rho_k / q^2, zero mode -> 0
# ---------------------------------------------------------------------------


def _poisson_kernel(scale_ref, re_ref, im_ref, ore_ref, oim_ref, *, size, dims):
    b = pl.program_id(0)
    scale = scale_ref[b]
    q2 = _freq_sq_plane(size, re_ref.dtype)
    if dims == 3:
        qz = _qz(pl.program_id(1), size, re_ref.dtype)
        q2 = q2 + qz * qz
    nonzero = q2 > 0.0
    factor = jnp.where(nonzero, scale / jnp.where(nonzero, q2, 1.0), 0.0)
    ore_ref[...] = (re_ref[...].reshape(size, size) * factor).reshape(ore_ref.shape)
    oim_ref[...] = (im_ref[...].reshape(size, size) * factor).reshape(oim_ref.shape)


@functools.partial(jax.jit, static_argnames=("size", "dims"))
def poisson_multiply(
    rho_k: jax.Array, scale: jax.Array, size: int, dims: int
) -> jax.Array:
    """phi_k = scale_b * rho_k / q^2 with the k=0 mode zeroed.

    ``scale`` shape (B,) = -poisson_coeff * (size*dx / (2*pi))^2 (the
    k^2 = (2*pi/(N dx))^2 q^2 scaling folded in). Counterpart of the
    potential k-space multiply + zero-mode fix
    (`simulation_object.rs:1076-1102`).
    """
    rdtype = jnp.finfo(rho_k.dtype).dtype
    batch = rho_k.shape[0]
    grid = (batch, size) if dims == 3 else (batch,)
    if dims == 3:
        block = (1, 1, size, size)
        index_map = lambda b, zi, _s: (b, zi, 0, 0)
    else:
        block = (1, size, size)
        index_map = lambda b, _s: (b, 0, 0)

    spec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_poisson_kernel, size=size, dims=dims),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(rho_k.shape, rdtype),
            jax.ShapeDtypeStruct(rho_k.shape, rdtype),
        ],
        interpret=_interpret(),
    )(scale.astype(rdtype), jnp.real(rho_k), jnp.imag(rho_k))
    return jax.lax.complex(out[0], out[1])


# ---------------------------------------------------------------------------
# phase_rotate: z * exp(i * coeff * field) (generic; field read from HBM)
# ---------------------------------------------------------------------------


def _rotate_kernel(coeff_ref, re_ref, im_ref, f_ref, ore_ref, oim_ref):
    b = pl.program_id(0)
    theta = coeff_ref[b] * f_ref[...]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    re = re_ref[...]
    im = im_ref[...]
    ore_ref[...] = re * c - im * s
    oim_ref[...] = re * s + im * c


@jax.jit
def phase_rotate(z: jax.Array, field: jax.Array, coeff: jax.Array) -> jax.Array:
    """z * exp(i * coeff_b * field) — one fused VPU pass per stream.

    z: (B, *grid) complex; field: (B, *grid) real; coeff: (B,).
    """
    rdtype = jnp.finfo(z.dtype).dtype
    batch = z.shape[0]
    rest = z.shape[1:]
    block = (1,) + rest
    index_map = lambda b, _s: (b,) + (0,) * len(rest)
    spec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _rotate_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch,),
            in_specs=[spec, spec, spec],
            out_specs=[spec, spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(z.shape, rdtype),
            jax.ShapeDtypeStruct(z.shape, rdtype),
        ],
        interpret=_interpret(),
    )(coeff.astype(rdtype), jnp.real(z), jnp.imag(z), field.astype(rdtype))
    return jax.lax.complex(out[0], out[1])


def kinetic_scale(coeff, size: int, dx: float):
    """Fold the physical k-grid scaling into the kinetic coefficient."""
    return coeff * (2.0 * math.pi / (size * dx)) ** 2


def poisson_scale(poisson_coeff: float, size: int, dx: float) -> float:
    """Fold the k-grid scaling into the Poisson coefficient (negated)."""
    return -poisson_coeff * (size * dx / (2.0 * math.pi)) ** 2
