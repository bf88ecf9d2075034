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


# ---------------------------------------------------------------------------
# Fock-space machinery (python_deprecated/QUtils.py:15-433 restoration)
# ---------------------------------------------------------------------------

import math

from msm_tpu.models import fock
from msm_tpu.models.quantum import (
    linear_entropy,
    subregion_density_matrix,
    von_neumann_entropy,
)


def test_fock_basis_and_number_ops():
    sp = fock.FockSpace.fixed_total(n_modes=3, n_total=2)
    # C(3+2-1, 2) = 6 states of 2 particles in 3 modes
    assert sp.n_states == 6
    psi = sp.basis_state((2, 0, 0))
    assert fock.number_expectation(psi, sp, 0) == pytest.approx(2.0)
    assert fock.number_expectation(psi, sp, 1) == pytest.approx(0.0)
    np.testing.assert_allclose(fock.number_expectations(psi, sp), [2, 0, 0])
    # <a_m> vanishes in a number eigenstate
    assert fock.field_expectation(psi, sp, 0) == pytest.approx(0.0)


def test_annihilation_ops_algebra():
    sp = fock.FockSpace.truncated(n_modes=2, n_max=2)
    a = fock.annihilation_ops(sp)
    # [a_m, a_m^dagger] = 1 on states below the truncation ceiling
    comm = a[0] @ a[0].T - a[0].T @ a[0]
    for occ in ((0, 0), (1, 0), (0, 2), (1, 1)):
        i = sp.state_index(occ)
        assert comm[i, i] == pytest.approx(1.0)
    # number operator from ladder ops matches the basis occupations
    n0 = a[0].T @ a[0]
    np.testing.assert_allclose(np.diag(n0), sp.basis[:, 0])


def test_partial_trace_product_vs_entangled():
    """Analytic anchor: a product state has zero entanglement entropy; the
    two-mode Bell state |10>+|01> has a maximally mixed reduced state
    (S_vn = ln 2, S_lin = 1/2)."""
    sp = fock.FockSpace.fixed_total(n_modes=2, n_total=1)
    product = sp.basis_state((1, 0))
    bell = (sp.basis_state((1, 0)) + sp.basis_state((0, 1))) / np.sqrt(2)

    rho_p, sub = fock.reduced_rho_from_psi(product, sp, keep_modes=[0])
    assert von_neumann_entropy(rho_p) == pytest.approx(0.0, abs=1e-12)
    assert float(linear_entropy(rho_p)) == pytest.approx(0.0, abs=1e-12)

    rho_b, sub_b = fock.reduced_rho_from_psi(bell, sp, keep_modes=[0])
    assert np.trace(rho_b).real == pytest.approx(1.0)
    assert von_neumann_entropy(rho_b) == pytest.approx(math.log(2), abs=1e-12)
    assert float(linear_entropy(rho_b)) == pytest.approx(0.5, abs=1e-12)
    # occupations of the kept mode: 0 and 1 with probability 1/2 each
    np.testing.assert_allclose(np.sort(np.diag(rho_b).real), [0.5, 0.5])

    # trace_out_modes over the full rho agrees with the pure-state shortcut
    rho_full = fock.psi_to_rho(bell)
    rho_t, sub_t = fock.trace_out_modes(rho_full, sp, modes=[1])
    assert sub_t.n_modes == 1
    np.testing.assert_allclose(rho_t, rho_b, atol=1e-14)


def test_trace_out_modes_three_mode_product():
    sp = fock.FockSpace.truncated(n_modes=3, n_max=1)
    # product of mode states: (|0>+|1>)/sqrt2 in each of modes 0,1; |1> in 2
    psi = np.zeros(sp.n_states, complex)
    for n0 in (0, 1):
        for n1 in (0, 1):
            psi[sp.state_index((n0, n1, 1))] = 0.5
    rho, sub = fock.trace_out_modes(fock.psi_to_rho(psi), sp, modes=[1, 2])
    assert sub.n_modes == 1 and rho.shape == (2, 2)
    # reduced state of mode 0 is pure (|0>+|1>)/sqrt2
    assert von_neumann_entropy(rho) == pytest.approx(0.0, abs=1e-12)
    np.testing.assert_allclose(rho, 0.5 * np.ones((2, 2)), atol=1e-14)


def test_normal_ordered_expectation():
    sp = fock.FockSpace.fixed_total(n_modes=2, n_total=1)
    bell = (sp.basis_state((1, 0)) + sp.basis_state((0, 1))) / np.sqrt(2)
    # <a0^dagger a1> = 1/2 for the Bell state
    val = fock.normal_ordered_expectation(bell, sp, create=[0], annihilate=[1])
    assert val == pytest.approx(0.5)
    # <a0^dagger a0> = <n_0> = 1/2
    val = fock.normal_ordered_expectation(bell, sp, create=[0], annihilate=[0])
    assert val == pytest.approx(fock.number_expectation(bell, sp, 0))
    # two-particle ladder weights: <2,0| a0†a0† a1 a1 |0,2> on superposition
    sp2 = fock.FockSpace.fixed_total(n_modes=2, n_total=2)
    psi = (sp2.basis_state((2, 0)) + sp2.basis_state((0, 2))) / np.sqrt(2)
    val = fock.normal_ordered_expectation(psi, sp2, create=[0, 0], annihilate=[1, 1])
    assert val == pytest.approx(np.sqrt(2 * 1) * np.sqrt(1 * 2) / 2)


def test_subregion_density_matrix_entropy():
    """Identical streams (a pure one-particle state) give an (almost) pure
    subregion rho; decohered random streams give high entropy."""
    rng = np.random.default_rng(0)
    n = 32
    x = np.arange(n) / n
    base = np.exp(2j * np.pi * x) / np.sqrt(n)
    streams_pure = np.stack([base] * 8)
    mask = np.zeros(n, bool)
    mask[: n // 2] = True
    rho = subregion_density_matrix(streams_pure, dims=1, dv=1.0, mask=mask)
    assert np.trace(rho).real == pytest.approx(1.0)
    assert von_neumann_entropy(rho) == pytest.approx(0.0, abs=1e-9)

    streams_mixed = np.stack(
        [
            np.exp(2j * np.pi * rng.uniform(size=n)) / np.sqrt(n)
            for _ in range(8)
        ]
    )
    rho_m = subregion_density_matrix(streams_mixed, dims=1, dv=1.0, mask=mask)
    assert von_neumann_entropy(rho_m) > 1.0
