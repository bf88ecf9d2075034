"""Split-step (kick-drift-kick) pseudo-spectral Schrodinger-Poisson stepper.

TPU-native counterpart of `SimulationObject::update`
(`simulator/src/simulation_object.rs:475-661` static, `:669-873` expanding),
`get_timestep` (`:878-990`), `calculate_potential` (`:1031-1110`) and
`check_alias` (`:1249-1293`).

Architecture (deliberately not a port):

- The state is a pytree (`SimState`) and one step is a pure function
  ``step(state) -> state``; the whole advance-to-next-dump loop runs inside
  a single jitted `lax.while_loop` (`evolve_to_next_dump`), so the reference's
  per-step device->host syncs for `max|phi|` and the alias sum disappear —
  the host only sees the state at dump boundaries.
- Streams batch over a leading axis with `vmap`; each stream carries its own
  adaptive dt, dump counter, and alias flag (one stream aliasing does not
  kill the batch — it freezes and is reported, unlike the reference panic,
  `simulation_object.rs:607-617`).
- Static configuration (grid constants, masks, dump tables) is closed over
  and constant-folded by XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cosmo as cosmo_mod
from .config import SimulationParameters
from .constants import POIS_CONST
from .grid import spec_grid as build_spec_grid
from .ops import fft
from .ops.phase import apply_kinetic_phase, apply_potential_phase
from .ops.poisson import solve_poisson


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Per-stream integrator state (pytree).

    psi and psik are kept mutually consistent at step boundaries, mirroring
    the reference's `SimulationGrid` carrying both (`simulation_object.rs:42-64`).
    """

    psi: jax.Array
    psik: jax.Array
    time: jax.Array
    tau: jax.Array  # supercomoving time (expanding mode; 0 otherwise)
    a: jax.Array  # scale factor (expanding mode; 1 otherwise)
    current_dumps: jax.Array  # int32
    n_steps: jax.Array  # int32
    just_dumped: jax.Array  # bool: last step landed exactly on a dump boundary
    aliased: jax.Array  # bool: Fourier aliasing detected (stream is frozen)
    alias_mass: jax.Array


class Stepper:
    """Compiled stepper for one resolved configuration.

    All jitted callables treat grid constants as compile-time constants;
    re-instantiate for a different config.
    """

    def __init__(self, params: SimulationParameters, dtype=jnp.complex64):
        self.params = params
        self.dtype = jnp.dtype(dtype)
        self.rdtype = jnp.finfo(self.dtype).dtype
        # Time bookkeeping in float64 when enabled (x64 mode), else float32.
        self.tdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        p = params
        spec = build_spec_grid(p.dx, p.dims, p.size)
        self.k2_max = float(spec.max())
        self.spec_grid = jnp.asarray(spec, self.rdtype)
        # Static alias mask: modes with k^2 > k2_cutoff * k2_max (check_alias,
        # simulation_object.rs:1262-1277).
        self.alias_mask = jnp.asarray(spec > p.k2_cutoff * self.k2_max, self.rdtype)

        # Dump schedule: t_dump[i] = i * T / num_dumps ("TODO: fix for
        # initial_time != 0" retained from simulation_object.rs:627-631).
        n_dumps = p.num_data_dumps
        self.dump_times = np.arange(n_dumps + 1) * p.final_sim_time / n_dumps

        if p.expanding:
            assert p.cosmology is not None and p.comoving_boxsize is not None
            self.tau_dumps = cosmo_mod.tau_at_times(p.cosmology, self.dump_times)
            self.final_sim_tau = float(self.tau_dumps[-1])
            self.a0 = 1.0 / (1.0 + p.cosmology.z0)
            # Density prefactor in supercomoving units
            # (calculate_density, simulation_object.rs:1032-1048):
            # Mtot * POIS_CONST * (2 / (3 H0^2 Omega_m))^(1/4) / hbar_^(d/2)
            c = p.cosmology
            self.density_prefactor = (
                p.total_mass
                * POIS_CONST
                * (2.0 / (3.0 * c.h0_per_myr**2 * c.omega_matter_now)) ** 0.25
                / p.hbar_ ** (p.dims / 2.0)
            )
            self.poisson_coeff = 1.0
            self._tau_dumps_dev = jnp.asarray(self.tau_dumps, self.tdtype)
        else:
            self.tau_dumps = None
            self.density_prefactor = p.total_mass
            self.poisson_coeff = POIS_CONST

        # Everything device-side is jitted: on the axon TPU backend eager
        # dispatch round-trips a remote compile per op, so the driver path
        # must consist solely of compiled calls + host transfers.
        self._jit_step = jax.jit(self._step)
        self._jit_evolve = jax.jit(self._evolve_to_next_dump)
        self._jit_evolve_batch = jax.jit(jax.vmap(self._evolve_to_next_dump))
        self._jit_potential = jax.jit(self._potential)
        self._jit_snap = jax.jit(self._snap_after_dump)
        self._jit_init = jax.jit(self._init_from_psi)

    # ------------------------------------------------------------------
    # State construction
    # ------------------------------------------------------------------

    def init_state(self, psi0, batched: bool = False) -> SimState:
        """Build the initial state; psik is populated with F[psi] up front
        (the reference lazily initializes it on the first update,
        simulation_object.rs:477-479)."""
        psi = np.asarray(psi0).astype(self.dtype)
        return self._jit_init(psi)

    def _init_from_psi(self, psi) -> SimState:
        psi = psi.astype(self.dtype)
        psik = fft.forward(psi, self.params.dims)
        t0 = jnp.asarray(self.params.time, self.tdtype)
        if self.params.expanding:
            tau0 = jnp.asarray(
                cosmo_mod.get_tau(self.params.cosmology, self.params.time),
                self.tdtype,
            )
            a0 = jnp.asarray(self.a0, self.tdtype)
        else:
            tau0 = jnp.zeros((), self.tdtype)
            a0 = jnp.ones((), self.tdtype)

        def scalars(x):
            return jnp.broadcast_to(x, psi.shape[: psi.ndim - self.params.dims])

        return SimState(
            psi=psi,
            psik=psik,
            time=scalars(t0),
            tau=scalars(tau0),
            a=scalars(a0),
            current_dumps=scalars(jnp.zeros((), jnp.int32)),
            n_steps=scalars(jnp.zeros((), jnp.int32)),
            just_dumped=scalars(jnp.zeros((), jnp.bool_)),
            aliased=scalars(jnp.zeros((), jnp.bool_)),
            alias_mass=scalars(jnp.zeros((), self.rdtype)),
        )

    # ------------------------------------------------------------------
    # Physics pieces
    # ------------------------------------------------------------------

    def _potential(self, psi):
        """Spectral Poisson solve (calculate_potential, :1031-1110)."""
        return solve_poisson(
            psi,
            self.spec_grid,
            self.params.dims,
            jnp.asarray(self.density_prefactor, self.rdtype),
            self.poisson_coeff,
        )

    def _timestep(self, phi, state: SimState):
        """Adaptive dt (or dtau): min of kinetic, potential, next-dump.

        Static: get_timestep `simulation_object.rs:878-934`;
        expanding: `:939-990` (with the per-step get_tau re-integration
        replaced by the precomputed tau-at-dump table).
        """
        p = self.params
        one = jnp.ones((), self.tdtype)
        phi_max = jnp.max(jnp.abs(phi)).astype(self.tdtype)
        if p.expanding:
            kinetic = one * (p.cfl * 2.0 * p.comoving_boxsize / np.sqrt(self.k2_max))
            potential = p.cfl * 2.0 * np.pi / (2.0 * state.a * phi_max)
            to_next = (
                self._tau_dumps_dev[
                    jnp.minimum(state.current_dumps + 1, p.num_data_dumps)
                ]
                - state.tau
            )
        else:
            kinetic = one * (
                p.cfl * 2.0 * p.axis_length / (np.sqrt(self.k2_max) * p.hbar_)
            )
            potential = (
                p.cfl * 2.0 * np.pi * p.hbar_ / (2.0 * phi_max)
            )
            next_dump_time = (
                (state.current_dumps + 1).astype(self.tdtype)
                * (p.final_sim_time / p.num_data_dumps)
            )
            to_next = next_dump_time - state.time
        dt = jnp.minimum(jnp.minimum(kinetic, potential), to_next)
        return dt, dt == to_next

    def _alias_mass(self, psik):
        """Probability mass above the alias cutoff (check_alias, :1249-1293)."""
        p = self.params
        mass = jnp.sum(
            jnp.real(psik * jnp.conj(psik)) * self.alias_mask,
            axis=tuple(range(-p.dims, 0)),
        )
        return mass * jnp.asarray(p.dk**p.dims, self.rdtype)

    # ------------------------------------------------------------------
    # One KDK step
    # ------------------------------------------------------------------

    def _step(self, state: SimState) -> SimState:
        if self.params.expanding:
            return self._step_expanding(state)
        return self._step_static(state)

    def _step_static(self, state: SimState) -> SimState:
        """One static-space KDK step (update, :475-661)."""
        p, hbar_ = self.params, self.params.hbar_

        phi = self._potential(state.psi)
        dt, is_dump = self._timestep(phi, state)
        dtc = dt.astype(self.rdtype)

        # Half kick in k-space: exp(-i * dt/4 * hbar_ * k^2) (:504-516)
        psik = apply_kinetic_phase(state.psik, self.spec_grid, -dtc / 4.0 * hbar_)
        psi = fft.inverse(psik, p.dims)
        # Full potential kick at the half-step: exp(-i * dt/hbar_ * phi) (:530-545)
        phi = self._potential(psi)
        psi = apply_potential_phase(psi, phi, -dtc / hbar_)
        psik = fft.forward(psi, p.dims)
        # Second half kick (:562-574)
        psik = apply_kinetic_phase(psik, self.spec_grid, -dtc / 4.0 * hbar_)
        psi = fft.inverse(psik, p.dims)

        time = state.time + dt
        alias_mass = self._alias_mass(psik)
        aliased = state.aliased | (alias_mass > p.alias_threshold)

        return SimState(
            psi=psi,
            psik=psik,
            time=time,
            tau=state.tau,
            a=state.a,
            current_dumps=state.current_dumps,
            n_steps=state.n_steps + 1,
            just_dumped=is_dump,
            aliased=aliased,
            alias_mass=alias_mass,
        )

    def _step_expanding(self, state: SimState) -> SimState:
        """One expanding-universe KDK step in dtau (update, :669-873).

        The kinetic factor drops hbar_ (:699-706); the potential update is
        two half-kicks exp(-i * dtau/2 * a * phi) with the scale factor (and
        physical time) advanced by dtau/2 between them (:726-760).
        """
        p = self.params
        c = p.cosmology

        phi = self._potential(state.psi)
        dtau, is_dump = self._timestep(phi, state)
        dtc = dtau.astype(self.rdtype)

        psik = apply_kinetic_phase(state.psik, self.spec_grid, -dtc / 4.0)
        psi = fft.inverse(psik, p.dims)
        phi = self._potential(psi)

        a, t, tau = state.a, state.time, state.tau
        for _ in range(2):
            psi = apply_potential_phase(
                psi, phi, (-dtc / 2.0) * a.astype(self.rdtype)
            )
            a, t = cosmo_mod.advance_a_t_by_dtau(a, t, dtau / 2.0, c)
            tau = tau + dtau / 2.0

        psik = fft.forward(psi, p.dims)
        psik = apply_kinetic_phase(psik, self.spec_grid, -dtc / 4.0)
        psi = fft.inverse(psik, p.dims)

        alias_mass = self._alias_mass(psik)
        aliased = state.aliased | (alias_mass > p.alias_threshold)

        return SimState(
            psi=psi,
            psik=psik,
            time=t,
            tau=tau,
            a=a,
            current_dumps=state.current_dumps,
            n_steps=state.n_steps + 1,
            just_dumped=is_dump,
            aliased=aliased,
            alias_mass=alias_mass,
        )

    # ------------------------------------------------------------------
    # Dump-to-dump evolution (the jitted hot loop)
    # ------------------------------------------------------------------

    def _evolve_to_next_dump(self, state: SimState) -> SimState:
        """Advance until a step lands on the next dump boundary (or aliasing).

        The loop exit mirrors the reference's dump flag: the step that took
        `time_to_next_dump` as its dt sets just_dumped (get_timestep,
        :926-930); dump counter increment and time snapping happen at the
        host in the driver, as in update() (:620-631).
        """
        finished = state.current_dumps >= self.params.num_data_dumps

        def cond(s: SimState):
            return ~(s.just_dumped | s.aliased | finished)

        return jax.lax.while_loop(cond, self._step, state)

    def evolve_to_next_dump(self, state: SimState, batched: bool = False) -> SimState:
        fn = self._jit_evolve_batch if batched else self._jit_evolve
        return fn(state)

    def step(self, state: SimState) -> SimState:
        return self._jit_step(state)

    def potential(self, psi):
        return self._jit_potential(psi)

    # ------------------------------------------------------------------
    # Host-side dump bookkeeping
    # ------------------------------------------------------------------

    def snap_after_dump(self, state: SimState) -> SimState:
        return self._jit_snap(state)

    def _snap_after_dump(self, state: SimState) -> SimState:
        """Increment the dump counter and snap time onto the dump grid.

        Mirrors update()'s post-dump bookkeeping
        (`simulation_object.rs:620-631` static, `:828-844` expanding).
        Vectorizes over any leading batch axes.
        """
        p = self.params
        dumps = state.current_dumps + state.just_dumped.astype(jnp.int32)
        snapped_t = dumps.astype(self.tdtype) * (p.final_sim_time / p.num_data_dumps)
        new_time = jnp.where(state.just_dumped, snapped_t, state.time)
        if p.expanding:
            snapped_tau = jnp.asarray(self.tau_dumps, self.tdtype)[
                jnp.minimum(dumps, p.num_data_dumps)
            ]
            new_tau = jnp.where(state.just_dumped, snapped_tau, state.tau)
        else:
            new_tau = state.tau
        return dataclasses.replace(
            state,
            current_dumps=dumps,
            time=new_time,
            tau=new_tau,
            just_dumped=jnp.zeros_like(state.just_dumped),
        )

    def not_finished(self, state: SimState) -> bool:
        """Whether any stream still has evolution left (not_finished, :1226-1228).

        Host-side numpy on fetched scalars — no eager device ops.
        """
        done = (np.asarray(state.current_dumps) >= self.params.num_data_dumps) | (
            np.asarray(state.aliased)
        )
        return not bool(np.all(done))
