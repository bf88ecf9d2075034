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
SMEM (scalar prefetch). Grids are processed in z-plane chunks sized to stay
well inside VMEM (a whole-grid block at 256^3 would need ~0.5 GB). Complex
arrays travel as separate real/imag planes (TPU Pallas has no native
complex dtype).

Eligibility: cube grids, dims in {2, 3}, X a multiple of 128 (f32 lane
tiling); callers fall back to the jnp path otherwise (`msm_tpu.ops.phase`).
Kernels run in interpret mode off-TPU so the same code path is testable on
CPU.
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


# Per-kernel scoped VMEM budget. The pipeline double-buffers every ref, so a
# 5-ref phase_rotate at the 2 MB z-chunk size needs ~20 MB + iota temps —
# beyond the 16 MB default but well within a v5e core's VMEM.
_VMEM_LIMIT = 96 * 1024 * 1024


def _z_block(size: int) -> int:
    """Planes per grid step: <=8, dividing size, <=4 MB f32 per ref."""
    zb = max(1, min(8, (1 << 20) // (size * size)))
    while size % zb:
        zb -= 1
    return zb


def eligible(shape: tuple[int, ...], dims: int) -> bool:
    """Whether the fused kernels support this grid."""
    if dims not in (2, 3):
        return False
    size = shape[-1]
    if any(s != size for s in shape[-dims:]):
        return False
    return size % 128 == 0


def _freq_sq(zi, zb: int, size: int, dims: int, dtype):
    """q^2 over one (1, zb, S, S) block (3-D) or (1, S, S) plane (2-D).

    q(i) = i for i < size/2 else i - size — the integer fftfreq numerator
    (`simulator/src/utils/fft.rs:100-120`). Synthesized from iota; zero HBM
    traffic.
    """
    half = size // 2
    if dims == 3:
        shape = (1, zb, size, size)
        z_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + zi * zb
        y_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        x_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
        qz = jnp.where(z_idx < half, z_idx, z_idx - size).astype(dtype)
        qy = jnp.where(y_idx < half, y_idx, y_idx - size).astype(dtype)
        qx = jnp.where(x_idx < half, x_idx, x_idx - size).astype(dtype)
        return qz * qz + qy * qy + qx * qx
    shape = (1, size, size)
    y_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    qy = jnp.where(y_idx < half, y_idx, y_idx - size).astype(dtype)
    qx = jnp.where(x_idx < half, x_idx, x_idx - size).astype(dtype)
    return qy * qy + qx * qx


def _grid_and_specs(z_shape: tuple[int, ...], size: int, dims: int):
    """(grid, BlockSpec) chunking a (B, *grid) array into z-plane blocks."""
    batch = z_shape[0]
    if dims == 3:
        zb = _z_block(size)
        grid = (batch, size // zb)
        block = (1, zb, size, size)
        index_map = lambda b, zi, *_refs: (b, zi, 0, 0)
        return grid, pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM), zb
    grid = (batch,)
    block = (1, size, size)
    index_map = lambda b, *_refs: (b, 0, 0)
    return grid, pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM), 1


# ---------------------------------------------------------------------------
# kinetic_phase: z *= exp(i * scale * q^2)
# ---------------------------------------------------------------------------


def _kinetic_kernel(scale_ref, re_ref, im_ref, ore_ref, oim_ref, *, size, dims, zb):
    b = pl.program_id(0)
    zi = pl.program_id(1) if dims == 3 else 0
    theta = scale_ref[b] * _freq_sq(zi, zb, size, dims, re_ref.dtype)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    re = re_ref[...]
    im = im_ref[...]
    ore_ref[...] = re * c - im * s
    oim_ref[...] = re * s + im * c


@functools.partial(jax.jit, static_argnames=("size", "dims"))
def kinetic_phase(z: jax.Array, scale: jax.Array, size: int, dims: int) -> jax.Array:
    """z * exp(i * scale_b * q^2) with q^2 built from indices in-kernel.

    ``scale`` has shape (B,) = coeff_b * (2*pi / (size*dx))^2, i.e. the
    per-stream kinetic coefficient with the physical k-grid scaling folded
    in (theta = coeff * k^2, k^2 = (2*pi/(N dx))^2 * q^2).
    """
    rdtype = jnp.finfo(z.dtype).dtype
    grid, spec, zb = _grid_and_specs(z.shape, size, dims)
    out = pl.pallas_call(
        functools.partial(_kinetic_kernel, size=size, dims=dims, zb=zb),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(scale.astype(rdtype), jnp.real(z), jnp.imag(z))
    return jax.lax.complex(out[0], out[1])


# ---------------------------------------------------------------------------
# poisson_multiply: rho_k -> scale * rho_k / q^2, zero mode -> 0
# ---------------------------------------------------------------------------


def _poisson_kernel(scale_ref, re_ref, im_ref, ore_ref, oim_ref, *, size, dims, zb):
    b = pl.program_id(0)
    zi = pl.program_id(1) if dims == 3 else 0
    q2 = _freq_sq(zi, zb, size, dims, re_ref.dtype)
    nonzero = q2 > 0.0
    factor = jnp.where(nonzero, scale_ref[b] / jnp.where(nonzero, q2, 1.0), 0.0)
    ore_ref[...] = re_ref[...] * factor
    oim_ref[...] = im_ref[...] * factor


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
    grid, spec, zb = _grid_and_specs(rho_k.shape, size, dims)
    out = pl.pallas_call(
        functools.partial(_poisson_kernel, size=size, dims=dims, zb=zb),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
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


@functools.partial(jax.jit, static_argnames=("size", "dims"))
def phase_rotate(
    z: jax.Array, field: jax.Array, coeff: jax.Array, size: int, dims: int
) -> jax.Array:
    """z * exp(i * coeff_b * field) — one fused VPU pass per z-chunk.

    z: (B, *grid) complex; field: (B, *grid) real; coeff: (B,).
    """
    rdtype = jnp.finfo(z.dtype).dtype
    grid, spec, _zb = _grid_and_specs(z.shape, size, dims)
    out = pl.pallas_call(
        _rotate_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=[spec, spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(z.shape, rdtype),
            jax.ShapeDtypeStruct(z.shape, rdtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(coeff.astype(rdtype), jnp.real(z), jnp.imag(z), field.astype(rdtype))
    return jax.lax.complex(out[0], out[1])


def kinetic_scale(coeff, size: int, dx: float):
    """Fold the physical k-grid scaling into the kinetic coefficient."""
    return coeff * (2.0 * math.pi / (size * dx)) ** 2


def poisson_scale(poisson_coeff: float, size: int, dx: float) -> float:
    """Fold the k-grid scaling into the Poisson coefficient (negated)."""
    return -poisson_coeff * (size * dx / (2.0 * math.pi)) ** 2
