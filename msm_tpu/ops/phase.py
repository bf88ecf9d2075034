"""Fused phase-rotation ops: psi * exp(i * coeff * field).

These are the memory-bound elementwise interludes between FFTs in the KDK
step (`simulator/src/simulation_object.rs:504-516,535-545,562-574`). The
default implementations below are jnp expressions that XLA fuses into single
VPU loops; `msm_tpu.ops.pallas_kernels` provides hand-fused Pallas variants
(enabled via `use_pallas`) that additionally avoid materializing the phase
factor and compute cos/sin in VMEM.
"""

from __future__ import annotations

import jax.numpy as jnp

_USE_PALLAS = False


def use_pallas(enable: bool = True) -> None:
    """Globally toggle the Pallas fast path for phase rotations."""
    global _USE_PALLAS
    _USE_PALLAS = enable


def _rotate_jnp(z, theta):
    """z * exp(i * theta) on real planes: one fused cos/sin + FMA loop."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    re, im = jnp.real(z), jnp.imag(z)
    return (re * c - im * s) + 1j * (re * s + im * c)


def apply_kinetic_phase(psik, spec_grid, coeff):
    """psik * exp(i * coeff * k^2); coeff is a traced scalar."""
    if _USE_PALLAS:
        from . import pallas_kernels

        return pallas_kernels.phase_rotate(psik, spec_grid, coeff)
    theta = jnp.asarray(coeff).astype(spec_grid.dtype) * spec_grid
    return _rotate_jnp(psik, theta)


def apply_potential_phase(psi, phi, coeff):
    """psi * exp(i * coeff * phi); phi is real with psi's leading axes."""
    if _USE_PALLAS:
        from . import pallas_kernels

        return pallas_kernels.phase_rotate(psi, phi, coeff)
    theta = jnp.asarray(coeff).astype(phi.dtype) * phi
    return _rotate_jnp(psi, theta)
