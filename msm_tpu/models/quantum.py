"""Quantum-statistics analysis of stream ensembles.

The Rust reference reduced its quantum analysis to the Qx breaking measure;
its Python ancestor computed much more — density matrices, partial traces,
von Neumann / linear entropies, field- and number-operator expectations
(`python_deprecated/QUtils.py:15-433`, SURVEY.md §2.2 P9). This module
restores that capability set on the stream-ensemble representation:

- the ensemble of streams {psi_s} estimates the one-particle density matrix
  rho(x, y) = <psi*(x) psi(y)> (normalized to unit trace),
- purity Tr(rho^2), linear entropy 1 - purity, von Neumann entropy
  -Tr(rho ln rho),
- per-mode occupations <|psi_k|^2> and the k-space breaking measure
  Qk = sum(<|psi_k|^2> - |<psi_k>|^2) dk^d (the reference's commented
  registry example, `synthesizer/src/main.rs:103-107`).

Full-grid density matrices scale as (N^d)^2 — fine for 1-D/2-D grids; for
3-D use the mode-truncated estimator (`mode_density_matrix`), which
projects onto the K highest-occupation Fourier modes first.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_streams(psi_streams: jnp.ndarray, dims: int) -> jnp.ndarray:
    s = psi_streams.shape[0]
    return psi_streams.reshape(s, -1)


@partial(jax.jit, static_argnames=("dims",))
def one_particle_density_matrix(psi_streams, dims: int, dv: float):
    """rho[y, x] = <psi_s(y) psi_s*(x)>_s * dv, unit-trace normalized.

    The S-stream ensemble average estimates the field's reduced one-particle
    density matrix (the Wigner/Husimi samples realize the quantum state's
    phase-space distribution).
    """
    m = _flatten_streams(psi_streams, dims)
    s = m.shape[0]
    rho = (m.T @ jnp.conj(m)) * (dv / s)
    trace = jnp.trace(rho).real
    return rho / trace.astype(rho.dtype)


@jax.jit
def purity(rho):
    """Tr(rho^2) = sum |rho_ij|^2 for Hermitian rho — 1 for a pure state,
    1/rank for a maximal mixture."""
    return jnp.sum(jnp.abs(rho) ** 2)


@jax.jit
def linear_entropy(rho):
    """S_lin = 1 - Tr(rho^2) (QUtils' linear entropy)."""
    return 1.0 - purity(rho)


def von_neumann_entropy(rho) -> float:
    """S = -sum lambda ln lambda over the density-matrix spectrum."""
    evals = np.linalg.eigvalsh(np.asarray(rho))
    evals = np.clip(evals.real, 0.0, None)
    evals = evals / evals.sum()
    nz = evals[evals > 1e-15]
    return float(-(nz * np.log(nz)).sum())


@partial(jax.jit, static_argnames=("dims",))
def mode_occupations(psi_streams, dims: int):
    """<|psi_k|^2> over streams, ortho normalization, flattened mode index."""
    psik = jnp.fft.fftn(psi_streams, axes=tuple(range(-dims, 0)), norm="ortho")
    return jnp.mean(
        jnp.abs(_flatten_streams(psik, dims)) ** 2, axis=0
    )


def mode_density_matrix(psi_streams, dims: int, n_modes: int = 64):
    """Density matrix projected onto the n_modes highest-occupation modes.

    Makes entropy estimates tractable for 3-D grids: (K, K) instead of
    (N^3, N^3). Returns (rho_kk, mode_indices).
    """
    psik = jnp.fft.fftn(psi_streams, axes=tuple(range(-dims, 0)), norm="ortho")
    mk = _flatten_streams(psik, dims)
    occ = jnp.mean(jnp.abs(mk) ** 2, axis=0)
    idx = jnp.argsort(-occ)[:n_modes]
    sub = mk[:, idx]  # (S, K)
    s = sub.shape[0]
    rho = (sub.T @ jnp.conj(sub)) / s
    trace = jnp.trace(rho).real
    return rho / trace.astype(rho.dtype), idx


def subregion_density_matrix(psi_streams, dims: int, dv: float, mask):
    """One-particle density matrix restricted to a spatial subregion.

    The partial trace over the complement of `mask` (a boolean grid) in the
    one-particle sector: rho_A = rho[A, A] renormalized to unit trace. With
    the von Neumann entropy this gives the spatial entanglement profile the
    deprecated stack computed by tracing grid modes out of the Fock state
    (`python_deprecated/QUtils.py:19-183`; full Fock-space traces live in
    `models/fock.py`).
    """
    mask_flat = np.asarray(mask).reshape(-1)
    m = np.asarray(_flatten_streams(jnp.asarray(psi_streams), dims))[:, mask_flat]
    s = m.shape[0]
    rho = (m.T @ np.conj(m)) * (dv / s)
    tr = np.trace(rho).real
    return rho / tr


def qk_measure(psi_streams, dims: int, dk: float) -> complex:
    """Qk = sum(<|psi_k|^2> - |<psi_k>|^2) dk^d over the ensemble."""
    psik = jnp.fft.fftn(psi_streams, axes=tuple(range(-dims, 0)), norm="ortho")
    mean_k = jnp.mean(psik, axis=0)
    mean_k2 = jnp.mean(jnp.abs(psik) ** 2, axis=0)
    return complex(jnp.sum(mean_k2 - jnp.abs(mean_k) ** 2) * dk**dims)


def field_expectations(psi_streams, dims: int, dv: float) -> dict[str, np.ndarray]:
    """The QUtils-style expectation bundle over the ensemble."""
    mean_psi = jnp.mean(psi_streams, axis=0)
    mean_dens = jnp.mean(jnp.abs(psi_streams) ** 2, axis=0)
    return {
        "mean_field": np.asarray(mean_psi),
        "mean_density": np.asarray(mean_dens),
        "coherent_fraction": float(
            jnp.sum(jnp.abs(mean_psi) ** 2) / jnp.sum(mean_dens)
        ),
        "qx": complex(jnp.sum(mean_dens - jnp.abs(mean_psi) ** 2) * dv),
    }
