"""Pallas kernel parity tests (interpret mode on CPU): the fused kernels
must agree with the jnp reference path bit-for-bit at f64 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu.models.ics import build_ics
from msm_tpu.ops import pallas_kernels as pk
from msm_tpu.ops import phase as phase_ops
from msm_tpu.stepper import Stepper


def _rand_z(rng, shape, dtype=jnp.complex128):
    return jnp.asarray(
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape), dtype
    )


def test_eligibility():
    assert pk.eligible((128, 128), 2)
    assert pk.eligible((128, 128, 128), 3)
    assert not pk.eligible((64, 64), 2)  # needs X % 128 == 0
    assert not pk.eligible((128,), 1)
    assert not pk.eligible((128, 256), 2)  # non-cube


@pytest.mark.parametrize("dims", [2, 3])
def test_kinetic_phase_matches_jnp(rng, dims):
    from msm_tpu.grid import spec_grid

    size = 128
    batch = 2
    dx = 0.37
    z = _rand_z(rng, (batch,) + (size,) * dims)
    coeff = jnp.asarray(rng.standard_normal(batch) * 0.1)

    spec = jnp.asarray(spec_grid(dx, dims, size))
    expected = phase_ops.apply_kinetic_phase(
        z, spec, coeff.reshape((batch,) + (1,) * dims)
    )
    got = pk.kinetic_phase(z, pk.kinetic_scale(coeff, size, dx), size, dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-12)


@pytest.mark.parametrize("dims", [2, 3])
def test_poisson_multiply_matches_jnp(rng, dims):
    from msm_tpu.grid import spec_grid

    size = 128
    dx = 0.5
    pois = 7.7e-11
    z = _rand_z(rng, (1,) + (size,) * dims)

    spec = jnp.asarray(spec_grid(dx, dims, size))
    inv_k2 = jnp.where(spec > 0.0, 1.0, 0.0) / jnp.where(spec > 0.0, spec, 1.0)
    expected = (-pois * inv_k2).astype(z.dtype) * z
    scale = jnp.full((1,), pk.poisson_scale(pois, size, dx))
    got = pk.poisson_multiply(z, scale, size, dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-12)
    # zero mode exactly zero
    assert complex(got[0].reshape(-1)[0]) == 0.0


@pytest.mark.parametrize("dims", [2, 3])
def test_phase_rotate_matches_jnp(rng, dims):
    size = 128
    shape = (2,) + (size,) * dims
    z = _rand_z(rng, shape)
    field = jnp.asarray(rng.standard_normal(shape))
    coeff = jnp.asarray(rng.standard_normal(2))
    expected = phase_ops.apply_potential_phase(
        z, field, coeff.reshape((2,) + (1,) * dims)
    )
    got = pk.phase_rotate(z, field, coeff, size, dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-12)


def test_full_step_pallas_vs_jnp():
    """A full KDK step with the Pallas path must match the jnp path."""
    toml = cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=10.0,
        cfl=0.5,
        num_data_dumps=10,
        total_mass=1e10,
        sim_name="pl",
        k2_cutoff=0.95,
        alias_threshold=0.5,
        dims=2,
        size=128,
        ics=cfg.SphericalTophat(radius=5.0, delta=10.0, slope=50.0),
        hbar_=0.05,
    )
    p = cfg.resolve_parameters(toml)
    psi0 = build_ics(p)

    st_jnp = Stepper(p, jnp.complex128)
    st_jnp.use_pallas = False
    st_pl = Stepper(p, jnp.complex128)
    st_pl.use_pallas = True
    assert pk.eligible(p.shape, p.dims)

    s_jnp = st_jnp.step(st_jnp.init_state(psi0))
    s_pl = st_pl.step(st_pl.init_state(psi0))
    np.testing.assert_allclose(
        np.asarray(s_pl.psi), np.asarray(s_jnp.psi), atol=1e-12
    )
    np.testing.assert_allclose(float(s_pl.time), float(s_jnp.time), rtol=1e-14)
