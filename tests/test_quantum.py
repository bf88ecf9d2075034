"""Quantum-statistics analysis tests: density-matrix limits, entropies,
mode occupations (QUtils.py pedigree, SURVEY.md §2.2 P9)."""

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu.models import quantum


def _normalize(psi, dv):
    return psi / np.sqrt((np.abs(psi) ** 2).sum() * dv)


def test_pure_state_limit(rng):
    """Identical streams = a pure state: purity 1, entropies 0."""
    size, dv = 16, 0.5
    psi = _normalize(rng.standard_normal(size) + 1j * rng.standard_normal(size), dv)
    streams = jnp.asarray(np.stack([psi] * 8))
    rho = quantum.one_particle_density_matrix(streams, 1, dv)
    assert float(quantum.purity(rho)) == pytest.approx(1.0, abs=1e-10)
    assert float(quantum.linear_entropy(rho)) == pytest.approx(0.0, abs=1e-10)
    assert quantum.von_neumann_entropy(rho) == pytest.approx(0.0, abs=1e-8)


def test_maximal_mixture_limit():
    """Orthogonal equal-weight streams: purity 1/n, S_vN = ln n."""
    size, dv, n = 16, 1.0, 4
    streams = np.zeros((n, size), np.complex128)
    for i in range(n):
        streams[i, i] = 1.0  # orthonormal basis states
    rho = quantum.one_particle_density_matrix(jnp.asarray(streams), 1, dv)
    assert float(quantum.purity(rho)) == pytest.approx(1.0 / n, abs=1e-10)
    assert quantum.von_neumann_entropy(rho) == pytest.approx(np.log(n), abs=1e-8)


def test_density_matrix_hermitian_unit_trace(rng):
    size, dv = 8, 0.3
    streams = jnp.asarray(
        rng.standard_normal((5, size, size)) + 1j * rng.standard_normal((5, size, size))
    )
    rho = np.asarray(quantum.one_particle_density_matrix(streams, 2, dv))
    np.testing.assert_allclose(rho, rho.T.conj(), atol=1e-12)
    assert np.trace(rho).real == pytest.approx(1.0, abs=1e-12)
    evals = np.linalg.eigvalsh(rho)
    assert evals.min() > -1e-12  # positive semidefinite


def test_mode_truncated_matches_full_for_few_modes(rng):
    """With n_modes = N the truncated mode-space matrix has the same
    spectrum (entropy) as the full position-space one."""
    size, dv = 16, 0.7
    streams = jnp.asarray(
        rng.standard_normal((6, size)) + 1j * rng.standard_normal((6, size))
    )
    rho_x = quantum.one_particle_density_matrix(streams, 1, dv)
    rho_k, idx = quantum.mode_density_matrix(streams, 1, n_modes=size)
    # unitary change of basis: spectra agree
    ex = np.sort(np.linalg.eigvalsh(np.asarray(rho_x)))
    ek = np.sort(np.linalg.eigvalsh(np.asarray(rho_k)))
    np.testing.assert_allclose(ex, ek, atol=1e-10)


def test_qk_zero_for_identical_streams(rng):
    size = 16
    psi = rng.standard_normal(size) + 1j * rng.standard_normal(size)
    streams = jnp.asarray(np.stack([psi] * 4))
    assert abs(quantum.qk_measure(streams, 1, 0.5)) < 1e-10


def test_field_expectations(rng):
    size, dv = 16, 0.25
    base = _normalize(
        rng.standard_normal(size) + 1j * rng.standard_normal(size), dv
    )
    noisy = np.stack(
        [base + 0.01 * (rng.standard_normal(size) + 1j * rng.standard_normal(size))
         for _ in range(64)]
    )
    out = quantum.field_expectations(jnp.asarray(noisy), 1, dv)
    assert 0.9 < out["coherent_fraction"] <= 1.0
    assert out["qx"].real > 0.0  # incoherent power present
    np.testing.assert_allclose(out["mean_field"], noisy.mean(axis=0), atol=1e-12)
