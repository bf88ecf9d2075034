"""Physics validation beyond the reference's test suite: energy
conservation of the symplectic integrator, momentum conservation, and the
linear growth of density perturbations in an EdS universe."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu.models import ics
from msm_tpu.ops import fft
from msm_tpu.stepper import Stepper


def _params(**kw):
    defaults = dict(
        axis_length=30.0,
        final_sim_time=20.0,
        cfl=0.2,
        num_data_dumps=40,
        total_mass=1e10,
        sim_name="phys",
        k2_cutoff=0.95,
        alias_threshold=0.9,
        dims=2,
        size=32,
        ics=cfg.ColdGauss(mean=(15.0, 15.0), std=(4.0, 4.0)),
        hbar_=0.05,
    )
    defaults.update(kw)
    return cfg.resolve_parameters(cfg.TomlParameters(**defaults))


def _energy(psi, stepper, p):
    """E = hbar_^2/2 * int |grad psi|^2 + 1/2 * int phi |psi|^2 (per unit
    mass, static units). The 1/2 on the potential term accounts for the
    self-interaction double count."""
    psik = fft.forward(jnp.asarray(psi), p.dims)
    spec = np.asarray(stepper.consts.spec_grid)
    kin = 0.5 * p.hbar_**2 * np.sum(spec * np.abs(np.asarray(psik)) ** 2) * p.dk**p.dims
    phi = np.asarray(stepper.potential(jnp.asarray(psi)))
    pot = 0.5 * np.sum(phi * np.abs(np.asarray(psi)) ** 2) * p.dx**p.dims
    return kin + pot


def test_energy_conservation():
    """The KDK integrator conserves total energy to O(dt^2) over many steps."""
    p = _params()
    st = Stepper(p, jnp.complex128)
    state = st.init_state(ics.build_ics(p))
    e0 = _energy(np.asarray(state.psi), st, p)
    for _ in range(6):
        state = st.snap_after_dump(st.evolve_to_next_dump(state))
    e1 = _energy(np.asarray(state.psi), st, p)
    scale = abs(e0) if e0 != 0 else 1.0
    assert abs(e1 - e0) / scale < 5e-3, f"energy drifted {e0} -> {e1}"


def test_momentum_conservation():
    """Total momentum <psi| -i hbar_ grad |psi> is conserved (translation
    invariance of the periodic SP system)."""
    p = _params()
    st = Stepper(p, jnp.complex128)
    # boosted initial state: nonzero momentum
    psi0 = ics.build_ics(p)
    x = (2 * np.arange(p.size) + 1) * p.dx / 2
    kick = np.exp(1j * 2 * np.pi * 2 * x / p.axis_length)  # mode-2 boost
    psi0 = psi0 * kick[None, :]

    def momentum(psi):
        psik = np.asarray(fft.forward(jnp.asarray(psi), p.dims))
        from msm_tpu.grid import get_kgrid

        k = 2 * np.pi * get_kgrid(p.dx, p.size)
        return p.hbar_ * np.sum(k[None, :] * np.abs(psik) ** 2) * p.dk**p.dims

    state = st.init_state(psi0)
    p0 = momentum(np.asarray(state.psi))
    for _ in range(4):
        state = st.snap_after_dump(st.evolve_to_next_dump(state))
    p1 = momentum(np.asarray(state.psi))
    assert p1 == pytest.approx(p0, rel=1e-8)


def test_eds_linear_growth():
    """In super-comoving coordinates a small density perturbation grows
    linearly with the scale factor during EdS matter domination (D ~ a).

    The supercomoving linearized system gives delta'' = a * <rho_sc> *
    delta, and delta ~ a requires <rho_sc> = 1/Omega_m = 1 — which fixes
    total_mass given (hbar_, h, z0, L). This is the physical calibration
    the reference's plane-wave workflow assumes (sim.py:124-183)."""
    from msm_tpu.constants import LITTLE_H_TO_BIG_H, POIS_CONST

    size = 32
    hbar_, h, z0 = 0.01, 0.5, 19.0
    cosmo = cfg.CosmologyConfig(
        omega_matter_now=1.0, omega_radiation_now=0.0, h=h, z0=z0, max_dloga=0.005
    )
    h0 = h * LITTLE_H_TO_BIG_H
    # pick the proper box so the supercomoving box is ~100 (k1 well above
    # the Jeans scale: k1^2 << a <rho>)
    target_box_sc = 100.0
    sc_factor = math.sqrt(math.sqrt(1.5 * h0**2) / hbar_)
    L_comoving = target_box_sc / sc_factor
    L_proper = L_comoving / (1.0 + z0)
    v_sc = target_box_sc**3
    # <rho_sc> = Mtot * POIS * (2/(3 H0^2))^(1/4) / hbar_^(3/2) / V_sc = 1
    total_mass = v_sc * hbar_**1.5 / (POIS_CONST * (2.0 / (3.0 * h0**2)) ** 0.25)

    # evolve a from 0.05 to ~0.2: t_final from EdS a(t)
    a_i, a_f = 1.0 / (1.0 + z0), 0.2
    t_final = (a_f**1.5 - a_i**1.5) / (1.5 * h0)

    toml = cfg.TomlParameters(
        axis_length=L_proper,
        final_sim_time=t_final,
        cfl=0.2,
        num_data_dumps=24,
        total_mass=total_mass,
        hbar_=hbar_,
        sim_name="growth",
        k2_cutoff=0.95,
        alias_threshold=0.9,
        dims=3,
        size=size,
        ics=cfg.ColdGauss(mean=(1.0,) * 3, std=(1.0,) * 3),  # replaced below
        cosmology=cosmo,
    )
    p = cfg.resolve_parameters(toml)
    assert p.comoving_boxsize == pytest.approx(target_box_sc, rel=1e-6)

    # seed a single k=1 mode along x on a uniform background, with the
    # growing-mode (Zel'dovich) velocity: theta = (a'/a) * delta / k^2 so
    # delta' = -grad^2 theta matches D+'/D+ * delta (zero-velocity seeding
    # would mix in the decaying mode and grow slower than a)
    eps = 1e-3
    xi = np.arange(size)
    k1 = 2 * np.pi / target_box_sc
    x_sc = (2 * xi + 1) * (target_box_sc / size) / 2
    delta0 = eps * np.cos(k1 * x_sc)
    a_prime_over_a = a_i**0.5 / math.sqrt(1.5)  # da/dtau / a for EdS
    theta0 = a_prime_over_a * delta0 / k1**2
    psi0 = (np.sqrt(1.0 + delta0) * np.exp(1j * theta0))[None, None, :] * np.ones(
        (size, size, 1)
    )
    psi0 = psi0 / math.sqrt(np.sum(np.abs(psi0) ** 2) * p.dx**3)

    st = Stepper(p, jnp.complex128)
    state = st.init_state(psi0.astype(np.complex128))

    amps, scales = [], []
    for _ in range(p.num_data_dumps):
        state = st.snap_after_dump(st.evolve_to_next_dump(state))
        dens = np.abs(np.asarray(state.psi)) ** 2
        dens = dens / dens.mean() - 1.0
        mode = np.fft.fft(dens.mean(axis=(0, 1)))[1]
        amps.append(2 * np.abs(mode) / size)
        scales.append(float(np.asarray(state.a)))

    growth = np.asarray(amps) / amps[0]
    expected = np.asarray(scales) / scales[0]
    assert expected[-1] > 2.5  # the universe expanded substantially
    np.testing.assert_allclose(growth, expected, rtol=0.15)
