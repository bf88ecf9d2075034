"""Cosmology tests: Einstein-de Sitter analytics for a(t) and tau(t),
solver consistency between host and in-jit paths."""

import math

import numpy as np
import pytest

from msm_tpu import cosmo
from msm_tpu.config import CosmologyConfig
from msm_tpu.constants import LITTLE_H_TO_BIG_H


def _eds(h=0.7, z0=9.0, max_dloga=1e-3):
    return CosmologyConfig(
        omega_matter_now=1.0, omega_radiation_now=0.0, h=h, z0=z0, max_dloga=max_dloga
    )


def test_eds_scale_factor_analytic():
    """EdS: a(t) = (a0^(3/2) + (3/2) H0 t)^(2/3)."""
    c = _eds()
    solver = cosmo.ScaleFactorSolver(c)
    a0 = 1.0 / (1.0 + c.z0)
    h0 = c.h * LITTLE_H_TO_BIG_H
    t = 500.0
    solver.step(t)
    expected = (a0 ** 1.5 + 1.5 * h0 * t) ** (2.0 / 3.0)
    assert solver.get_a() == pytest.approx(expected, rel=1e-6)


def test_eds_tau_analytic():
    """EdS: tau(t) = C * integral a(t)^-2 dt has the closed form
    (C / (1.5 H0)) * 3 * (x0^-1 - x^-1) with x = a^(1/2)... verified
    numerically against quadrature here."""
    c = _eds()
    a0 = 1.0 / (1.0 + c.z0)
    h0 = c.h * LITTLE_H_TO_BIG_H
    coeff = cosmo.supercomoving_coeff(c)
    times = np.array([0.0, 100.0, 400.0, 1000.0])
    taus = cosmo.tau_at_times(c, times)
    # quadrature with the analytic a(t)
    for t_target, tau in zip(times, taus):
        ts = np.linspace(0, t_target, 20001)
        a = (a0 ** 1.5 + 1.5 * h0 * ts) ** (2.0 / 3.0)
        expected = np.trapezoid(coeff / a**2, ts)
        assert tau == pytest.approx(expected, rel=1e-4, abs=1e-12)


def test_tau_monotone_sorted():
    c = _eds()
    times = np.linspace(0.0, 2000.0, 65)
    taus = cosmo.tau_at_times(c, times)
    assert np.all(np.diff(taus) > 0)


def test_advance_a_t_consistent_with_table():
    """In-jit RK4 over dtau must agree with the host-side t-sweep."""
    import jax.numpy as jnp

    c = _eds(max_dloga=1e-4)
    times = np.linspace(0.0, 800.0, 801)
    taus = cosmo.tau_at_times(c, times)
    a0 = 1.0 / (1.0 + c.z0)
    # advance (a, t) from 0 to tau_end in many small dtau steps
    a, t = jnp.float64(a0), jnp.float64(0.0)
    n = 2000
    dtau = taus[-1] / n
    for _ in range(n):
        a, t = cosmo.advance_a_t_by_dtau(a, t, dtau, c)
    assert float(t) == pytest.approx(times[-1], rel=1e-5)
    h0 = c.h * LITTLE_H_TO_BIG_H
    expected_a = (a0 ** 1.5 + 1.5 * h0 * times[-1]) ** (2.0 / 3.0)
    assert float(a) == pytest.approx(expected_a, rel=1e-5)


def test_lcdm_late_time_de_domination():
    c = CosmologyConfig(
        omega_matter_now=0.3, omega_radiation_now=0.0, h=0.7, z0=0.0
    )
    assert c.omega_de_now == pytest.approx(0.7)
    s = cosmo.ScaleFactorSolver(c)
    # over a Hubble time the expansion accelerates vs EdS
    s.step(5000.0)
    assert s.get_a() > 1.0
