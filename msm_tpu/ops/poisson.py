"""Spectral Poisson solver for the self-gravity potential.

TPU-native counterpart of `calculate_potential`
(`simulator/src/simulation_object.rs:1031-1110`):

    rho  = prefactor * |psi|^2
    phi(k) = -coeff * rho(k) / k^2,  phi(k=0) = 0
    phi  = Re F^-1[phi(k)]

In the static build ``prefactor = total_mass`` and ``coeff = POIS_CONST``;
in the expanding build the Poisson constant and supercomoving scalings are
folded into the density prefactor and ``coeff = 1``
(`simulation_object.rs:1031-1095`).

The reference zeroes the k=0 mode by NaN-replacement after dividing by k^2
(`:1097-1102`); we mask the zero mode directly, which is both cleaner and
cheaper on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fft


def solve_poisson(
    psi: jnp.ndarray,
    spec_grid: jnp.ndarray,
    dims: int,
    density_prefactor,
    poisson_coeff,
) -> jnp.ndarray:
    """Return the real potential phi with the same (real) dtype as |psi|.

    ``spec_grid`` is k^2 = (2*pi)^2 sum k_i^2 with 0 at the origin mode.
    """
    rho = density_prefactor * jnp.real(psi * jnp.conj(psi))
    rho_k = fft.forward(rho.astype(psi.dtype), dims)
    inv_k2 = jnp.where(spec_grid > 0.0, 1.0 / jnp.where(spec_grid > 0.0, spec_grid, 1.0), 0.0)
    phi_k = (-poisson_coeff) * rho_k * inv_k2.astype(psi.dtype)
    phi = jnp.real(fft.inverse(phi_k, dims))
    return phi
