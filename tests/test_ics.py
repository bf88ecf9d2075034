"""Initial-condition tests (reference has none beyond norm debug_asserts;
we test construction, normalization, symmetry, and validation)."""

import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu.models import ics


def _params(dims=3, size=16, L=30.0, ic=None, **kw):
    toml = cfg.TomlParameters(
        axis_length=L,
        final_sim_time=10.0,
        cfl=0.5,
        num_data_dumps=10,
        total_mass=1e11,
        sim_name="t",
        k2_cutoff=0.95,
        alias_threshold=0.02,
        dims=dims,
        size=size,
        ics=ic if ic is not None else cfg.SphericalTophat(5.0, 100.0, 50.0),
        hbar_=0.05,
        **kw,
    )
    return cfg.resolve_parameters(toml)


def _norm(psi, dx, dims):
    return np.sum(np.abs(psi) ** 2) * dx**dims


@pytest.mark.parametrize("dims", [1, 2, 3])
def test_cold_gauss_normalized(dims):
    ic = cfg.ColdGauss(mean=(15.0,) * dims, std=(5.0,) * dims)
    p = _params(dims=dims, ic=ic)
    psi = ics.build_ics(p)
    assert psi.shape == (p.size,) * dims
    assert _norm(psi, p.dx, dims) == pytest.approx(1.0, abs=1e-10)
    assert np.all(psi.imag == 0.0)  # zero phases


def test_cold_gauss_peak_location_and_axis_order():
    # Anisotropic mean: x peak (config axis 0) must move along the LAST
    # array axis (the reference's column-major x-fastest layout).
    ic = cfg.ColdGauss(mean=(5.0, 15.0, 15.0), std=(3.0, 3.0, 3.0))
    p = _params(ic=ic)
    psi = ics.build_ics(p)
    idx = np.unravel_index(np.argmax(np.abs(psi)), psi.shape)
    x = (2 * np.arange(p.size) + 1) * p.dx / 2
    assert abs(x[idx[2]] - 5.0) <= p.dx  # x axis = last
    assert abs(x[idx[0]] - 15.0) <= p.dx  # z axis = first


def test_cold_gauss_dim_mismatch():
    ic = cfg.ColdGauss(mean=(15.0,), std=(5.0,))
    p = _params(dims=3, ic=ic)
    with pytest.raises(AssertionError):
        ics.build_ics(p)


@pytest.mark.parametrize("dims", [1, 2, 3])
def test_tophat_profile(dims):
    ic = cfg.SphericalTophat(radius=5.0, delta=100.0, slope=50.0)
    p = _params(dims=dims, size=32, ic=ic)
    psi = ics.build_ics(p)
    assert _norm(psi, p.dx, dims) == pytest.approx(1.0, abs=1e-10)
    flat = np.abs(psi) ** 2
    # density contrast between center and edge approx (1 + delta)
    center = flat[(p.size // 2,) * dims]
    corner = flat[(0,) * dims]
    assert center / corner == pytest.approx(1.0 + ic.delta, rel=0.05)


def test_cold_gauss_kspace_seeded(rng):
    ic = cfg.ColdGaussKSpace(mean=(0.0,) * 3, std=(0.5,) * 3, phase_seed=7)
    p = _params(ic=ic, L=4.0)
    psi1 = ics.build_ics(p)
    psi2 = ics.build_ics(p)
    np.testing.assert_array_equal(psi1, psi2)  # deterministic
    assert _norm(psi1, p.dx, 3) == pytest.approx(1.0, abs=1e-8)

    ic3 = cfg.ColdGaussKSpace(mean=(0.0,) * 3, std=(0.5,) * 3, phase_seed=8)
    p3 = _params(ic=ic3, L=4.0)
    psi3 = ics.build_ics(p3)
    assert np.abs(psi3 - psi1).max() > 1e-6  # different seed differs


def test_user_specified_roundtrip(tmp_path):
    size = 8
    rng = np.random.default_rng(0)
    field = rng.standard_normal((size,) * 3) + 1j * rng.standard_normal((size,) * 3)
    path = tmp_path / "ics.npz"
    np.savez(path, real=field.real, imag=field.imag)
    p = _params(size=size, ic=cfg.UserSpecified(str(path)))
    psi = ics.build_ics(p)
    np.testing.assert_allclose(psi, field)


def test_user_specified_validation(tmp_path):
    field = np.zeros((8, 8, 8))
    path = tmp_path / "ics.npz"
    np.savez(path, real=field, imag=field)
    with pytest.raises(ValueError, match="Grid size"):
        ics.build_ics(_params(size=16, ic=cfg.UserSpecified(str(path))))
    with pytest.raises(ValueError, match="[Dd]imensions"):
        ics.build_ics(_params(dims=2, size=8, ic=cfg.UserSpecified(str(path))))
