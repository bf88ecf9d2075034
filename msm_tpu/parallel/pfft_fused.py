"""Spatially-sharded MXU fused-step engine: the round-2 single-device
kernel pipeline (ops/mxu_fft.py) composed with `all_to_all` relayouts over
the mesh's space axes.

The reference is strictly single-GPU (`simulator/src/main.rs:23`); its FFT
layer transforms whole grids in place (`simulator/src/utils/fft.rs:6-98`).
This module is the scale-out counterpart of the FUSED step — the pencil
jnp.fft path (parallel/pfft.py) remains as the generic fallback.

Design — one schedule for every space-sharded mesh
--------------------------------------------------

All active space axes are treated as ONE combined flattened axis `names`
(d = prod of their sizes): `lax.all_to_all` and `PartitionSpec` both accept
axis-name tuples with consistent major-to-minor flattening, so a (px, py)
"pencil" mesh runs the same schedule as a slab with d = px*py. This keeps
the two-axis fused2 kernels (the highest-fusion geometry: psi, rho, phi
synthesized in-register over the last TWO axes) in play on every mesh.
Requires size % d == 0 (checked by the stepper gating; the jnp.fft pencil
path covers the rest).

Distributions (3-D grid, leading stream batch axes pass through):

  canonical : (Z/d, Y,    X  )   psi real space       — psi_spec
  k-layout  : (Z,   Yk/d, Xk )   psik, engine order   — psik_spec
  mixed     : (Z,   Yk/d, Xk )   axis-0 spatial, (Y,X) in engine k
  gathered  : (Z/d, Yk,   Xk )   (Y,X) local — the fused2 kernels' home

Axis 0 (Z) is FULLY LOCAL in the k-layout/mixed distributions, so every
Z-axis kernel of the single-device engine — including the skew's
cross-step roundtrip pass A and the Poisson roundtrip — runs unchanged;
only the (Y,X) stages need one `all_to_all` each way. The k^2 tables are
separable, so each device synthesizes its shard-local kinetic phase,
Poisson map and alias mask from `spec_axis0` (full, local axis) plus its
slice of the 2-D `spec_axis12` table (sharded over the combined axis) —
no full-grid constants anywhere.

Per-step pass counts (each pass = one HBM read+write of the local shard):

  lagged skewed : 4 kernels + 4 all_to_alls      (single-device: 4 + 0)
  lagged plain  : 5 kernels + 4 all_to_alls      (single-device: 5 + 0)
  exact  skewed : 8 kernels + 7 all_to_alls
  vs the jnp.fft pencil path: ~12 local FFT passes + 8 all_to_alls + ~6
  elementwise passes + reduction reads (~18+ passes).

Reductions (norm, alias mass, max|phi|) leave each kernel as per-shard
partials and finish with `psum`/`pmax` over the combined axis, so every
device carries identical per-stream scalars — loop control inside the
shard_map'd while_loop stays coherent where collectives occur.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

from ..ops import mxu_fft as mx


def _blocks_per_lead(mxv, lead) -> int:
    """Leading-block count per batch row of a per-block partial array
    (static: derived from shapes, not from axis-size queries)."""
    nlead = int(np.prod(lead)) if lead else 1
    return mxv.shape[0] // nlead


class ShardedEngine:
    """Fused-step engine over a space-sharded mesh (see module docstring).

    Drop-in replacement for `mxu_fft.SingleEngine`: same method surface and
    return conventions; all returned reductions are already globally
    reduced over the space axes. Must be called from INSIDE shard_map with
    shard-local arrays and shard-local consts (consts.spec_axis12 arrives
    pre-sliced by its sharding).
    """

    def __init__(self, names: tuple, dims: int, poisson_coeff: float,
                 alias_cutoff: float, prefactor: float):
        assert dims == 3, "the sharded fused engine is defined for 3-D grids"
        self.names = tuple(names)
        self.dims = dims
        self.poisson_coeff = float(poisson_coeff)
        self.alias_cutoff = float(alias_cutoff)
        self.prefactor = float(prefactor)

    # -- relayouts ------------------------------------------------------

    def _to_gathered(self, *arrs):
        """mixed (Z, Yk/d, Xk) -> gathered (Z/d, Yk, Xk): split Z, concat Y."""
        nd = arrs[0].ndim
        out = tuple(
            lax.all_to_all(a, self.names, split_axis=nd - 3, concat_axis=nd - 2,
                           tiled=True)
            for a in arrs
        )
        return out if len(out) > 1 else out[0]

    def _to_mixed(self, *arrs):
        """gathered (Z/d, Yk, Xk) -> mixed (Z, Yk/d, Xk): split Y, concat Z."""
        nd = arrs[0].ndim
        out = tuple(
            lax.all_to_all(a, self.names, split_axis=nd - 2, concat_axis=nd - 3,
                           tiled=True)
            for a in arrs
        )
        return out if len(out) > 1 else out[0]

    # -- reduction finishers ---------------------------------------------

    def _psum(self, x):
        return lax.psum(x, self.names)

    def _pmax(self, x):
        return lax.pmax(x, self.names)

    @staticmethod
    def _s12(consts):
        # shard-local rows of the 2-D k1^2+k2^2 table, flattened to the
        # lanes order of the (Z, Yk/d, Xk) sublane view
        return consts.spec_axis12.reshape(-1)

    def _reduce_ns_am(self, lead, ns, am):
        ns = self._psum(jnp.sum(ns.reshape(lead + (-1,)), axis=-1))
        am = self._psum(jnp.sum(am.reshape(lead + (-1,)), axis=-1))
        return ns, am

    # -- transforms -------------------------------------------------------

    def forward(self, psi):
        """canonical psi -> k-layout psik (2 kernels + 1 all_to_all)."""
        xr = jnp.real(psi)
        xi = jnp.imag(psi)
        xr, xi = mx._axis_pass_fused2(xr, xi, inverse=False)
        xr, xi = self._to_mixed(xr, xi)
        xr, xi = mx._axis_pass_sublane(xr, xi, xr.ndim - 3, inverse=False)
        return jax.lax.complex(xr, xi)

    def inverse(self, psik):
        """k-layout psik -> canonical psi."""
        xr = jnp.real(psik)
        xi = jnp.imag(psik)
        xr, xi = mx._axis_pass_sublane(xr, xi, xr.ndim - 3, inverse=True)
        xr, xi = self._to_gathered(xr, xi)
        xr, xi = mx._axis_pass_fused2(xr, xi, inverse=True)
        return jax.lax.complex(xr, xi)

    def poisson_solve(self, psi, consts):
        """calculate_potential (:1031-1110) in 3 kernels + 2 all_to_alls:
        density synthesized in-register over (Y,X), Z roundtrip with the
        -coeff/k^2 map built from the separable tables, real inverse over
        (Y,X). rho, rho_k, phi_k never exist in HBM."""
        pr = jnp.real(psi)
        pi = jnp.imag(psi)
        xr, xi = mx._axis_pass_fused2_density(pr, pi, self.prefactor)
        xr, xi = self._to_mixed(xr, xi)
        xr, xi = mx._axis_pass_sublane_roundtrip_poisson_sep(
            xr, xi, xr.ndim - 3, consts.spec_axis0, self._s12(consts),
            self.poisson_coeff,
        )
        xr, xi = self._to_gathered(xr, xi)
        return mx._axis_pass_fused2_real((xr, xi), inverse=True)

    # -- fused steps ------------------------------------------------------

    def _interior(self, xr, xi, consts, vcoeff):
        """Passes 2-4 on the gathered distribution; input mixed, output
        gathered (the pass-4 layout). Returns (psi planes, q planes, local
        max|phi| partials)."""
        xr, xi = self._to_gathered(xr, xi)
        pr, pi, dr, di = mx._axis_pass_fused2_inv_density(xr, xi, self.prefactor)
        dr, di = self._to_mixed(dr, di)
        dr, di = mx._axis_pass_sublane_roundtrip_poisson_sep(
            dr, di, dr.ndim - 3, consts.spec_axis0, self._s12(consts),
            self.poisson_coeff,
        )
        dr, di = self._to_gathered(dr, di)
        qr, qi, mxv = mx._axis_pass_fused2_potkick_fwd(dr, di, pr, pi, vcoeff)
        return pr, pi, qr, qi, mxv

    def fused_step(self, psik, consts, kick, vcoeff):
        """The unskewed fused step interior: 5 kernels + 4 all_to_alls.
        Input/output psik in the k-layout; same contract as
        `mxu_fft.fused_step_3d` with reductions finished over the mesh."""
        lead = psik.shape[:-3]
        xr = jnp.real(psik)
        xi = jnp.imag(psik)
        xr, xi = mx._axis_pass_sublane_inv_kphase_sep(
            xr, xi, xr.ndim - 3, consts.spec_axis0, self._s12(consts), kick
        )
        pr, pi, qr, qi, mxv = self._interior(xr, xi, consts, vcoeff)
        qr, qi = self._to_mixed(qr, qi)
        qr, qi, ns, am = mx._axis_pass_sublane_fwd_reduce_sep(
            qr, qi, qr.ndim - 3, consts.spec_axis0, self._s12(consts),
            self.alias_cutoff,
        )
        n0_loc = _blocks_per_lead(mxv, lead)
        phi_max = self._pmax(jnp.max(mxv.reshape(lead + (n0_loc,)), axis=-1))
        ns, am = self._reduce_ns_am(lead, ns, am)
        return (
            jax.lax.complex(pr, pi),
            jax.lax.complex(qr, qi),
            ns,
            am,
            phi_max,
        )

    def fused_step_skewed(self, qr, qi, consts, kick, vcoeff):
        """The skewed step: 4 kernels + 4 all_to_alls. The carrier is the
        planar mixed-space field at the MIXED distribution (Z local), so
        the cross-step pass A — step i's closing axis-0 forward fused with
        step i+1's kick + axis-0 inverse — is one local kernel, exactly as
        on a single device. Same contract as `mxu_fft.fused_step_3d_skewed`
        (reductions describe the ENTERING state, one step behind)."""
        lead = qr.shape[:-3]
        xr, xi, ns, am = mx._axis_pass_sublane_roundtrip_kick_reduce_sep(
            qr, qi, qr.ndim - 3, consts.spec_axis0, self._s12(consts), kick,
            self.alias_cutoff,
        )
        _pr, _pi, qr2, qi2, mxv = self._interior(xr, xi, consts, vcoeff)
        qr2, qi2 = self._to_mixed(qr2, qi2)
        n0_loc = _blocks_per_lead(mxv, lead)
        phi_max = self._pmax(jnp.max(mxv.reshape(lead + (n0_loc,)), axis=-1))
        ns, am = self._reduce_ns_am(lead, ns, am)
        return qr2, qi2, ns, am, phi_max

    def exact_prefix(self, qr, qi, consts, pending):
        """The exact-dt pre-step potential evaluation (reference :497
        solve): 4 kernels + 3 all_to_alls. psi(t), rho and phi(t) never
        exist in HBM; returns the pending-kicked carrier and global
        max|phi(t)| (same contract as `mxu_fft.fused_step_exact_prefix`)."""
        lead = qr.shape[:-3]
        s12 = self._s12(consts)
        qr1, qi1 = mx._axis_pass_sublane_roundtrip_kick_reduce_sep(
            qr, qi, qr.ndim - 3, consts.spec_axis0, s12, pending, 0.0,
            with_reduce=False,
        )
        xr, xi = self._to_gathered(qr1, qi1)
        dr, di = mx._axis_pass_fused2_inv_density_rho_only(xr, xi, self.prefactor)
        dr, di = self._to_mixed(dr, di)
        dr, di = mx._axis_pass_sublane_roundtrip_poisson_sep(
            dr, di, dr.ndim - 3, consts.spec_axis0, s12, self.poisson_coeff
        )
        dr, di = self._to_gathered(dr, di)
        mxv = mx._axis_pass_fused2_real_inv_max(dr, di)
        n0_loc = _blocks_per_lead(mxv, lead)
        phi_max = self._pmax(jnp.max(mxv.reshape(lead + (n0_loc,)), axis=-1))
        return qr1, qi1, phi_max

    def skew_enter(self, psik):
        """k-layout psik -> planar carrier at the mixed distribution
        (F_0(q) == psik holds SHARD-LOCALLY: axis 0 is fully local)."""
        xr = jnp.real(psik)
        xi = jnp.imag(psik)
        return mx._axis_pass_sublane(xr, xi, xr.ndim - 3, inverse=True)

    def skew_exit(self, qr, qi, consts, pending):
        """Materialize (psi, psik, norm, alias) from the carrier: the
        deferred-kick axis-0 roundtrip (+ the final step's reductions),
        psik = F_0[q'] locally, psi = F_{1,2}^-1[q'] after one all_to_all.
        3 kernels + 1 all_to_all."""
        lead = qr.shape[:-3]
        qr2, qi2, ns, am = mx._axis_pass_sublane_roundtrip_kick_reduce_sep(
            qr, qi, qr.ndim - 3, consts.spec_axis0, self._s12(consts), pending,
            self.alias_cutoff,
        )
        kr, ki = mx._axis_pass_sublane(qr2, qi2, qr2.ndim - 3, inverse=False)
        xr, xi = self._to_gathered(qr2, qi2)
        pr, pi = mx._axis_pass_fused2(xr, xi, inverse=True)
        ns, am = self._reduce_ns_am(lead, ns, am)
        return jax.lax.complex(pr, pi), jax.lax.complex(kr, ki), ns, am
