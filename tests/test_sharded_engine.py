"""Spatially-sharded fused MXU engine (parallel/pfft_fused.py) equivalence.

The round-2 single-device kernel pipeline composed with all_to_all
relayouts must reproduce the single-device fused trajectories dump for
dump on virtual meshes — slab and 2-per-axis "pencil" shapes (both run the
combined-axis schedule), both dt modes, static and expanding. The
single-device fused path is itself equivalence-tested against the XLA
reference chain (test_stepper.py), so matching it transitively anchors the
mesh path to the reference semantics.

NB: dispatches are explicitly synced (block_until_ready) between programs —
on a 2-core host, 8 virtual devices running queued interpret-mode kernel
programs can miss XLA's 40 s CPU-collective rendezvous deadline.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from msm_tpu import config as cfg
from msm_tpu.models import ics
from msm_tpu.ops import fft as fft_ops
from msm_tpu.parallel.sharded import MeshStepper
from msm_tpu.stepper import Stepper


def _params(**kw):
    base = dict(
        axis_length=30.0,
        final_sim_time=1.0,
        cfl=0.5,
        num_data_dumps=2,
        total_mass=1e8,
        sim_name="sharded-engine",
        k2_cutoff=0.95,
        alias_threshold=0.5,
        dims=3,
        size=128,
        hbar_=0.02,
        ics={"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 10},
    )
    base.update(kw)
    toml = cfg.parse_toml_dict(base)
    return list(cfg.iter_stream_parameters(toml))[-1]


def _tuned_params(dumps=2, **kw):
    """final_sim_time such that each dump interval takes a few steps
    (kinetic-bound dt; see test_stepper._skew_params)."""
    p0 = _params(**kw)
    st0 = Stepper(p0, jnp.complex128)
    dt_k = p0.cfl * 2.0 * p0.axis_length / (math.sqrt(st0.k2_max) * p0.hbar_)
    return _params(num_data_dumps=dumps, final_sim_time=dumps * 2.5 * dt_k, **kw)


@pytest.fixture()
def batch_psi0():
    p = _params()
    psi0 = np.asarray(ics.build_ics(p))
    return np.stack([psi0, np.roll(psi0, 7, axis=0)])


def _mesh(shape):
    devs = np.asarray(jax.devices()).reshape(shape)
    return Mesh(devs, ("stream", "x", "y"))


def _assert_state_match(m, r, atol=1e-12):
    np.testing.assert_allclose(np.asarray(m.psi), np.asarray(r.psi), atol=atol)
    np.testing.assert_allclose(np.asarray(m.psik), np.asarray(r.psik), atol=atol)
    np.testing.assert_array_equal(np.asarray(m.n_steps), np.asarray(r.n_steps))
    np.testing.assert_allclose(
        np.asarray(m.time), np.asarray(r.time), rtol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(m.phi_max), np.asarray(r.phi_max), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m.alias_mass), np.asarray(r.alias_mass), atol=1e-13
    )


@pytest.mark.slow
@pytest.mark.parametrize("dtm", ["optimistic", "exact"])
def test_sharded_engine_interval_equivalence(batch_psi0, dtm):
    """One dump interval through the (2,2,2)-mesh skewed evolve loop ==
    the single-device fused engine, in both dt modes (VERDICT r2 item 1)."""
    p = _tuned_params()
    fft_ops.set_default_mode("mxu")
    try:
        st = Stepper(p, jnp.complex128, dt_mode=dtm, debug_checks=True)
        assert st.fuse_phases and st.skew
        ms = MeshStepper(p, _mesh((2, 2, 2)), jnp.complex128, dt_mode=dtm,
                         debug_checks=True)
        assert ms.stepper.sharded_engine and ms.stepper.skew
        r = jax.block_until_ready(st.init_state(batch_psi0))
        m = jax.block_until_ready(ms.init_state(batch_psi0))
        np.testing.assert_allclose(
            np.asarray(m.psik), np.asarray(r.psik), atol=1e-12
        )
        for _ in range(2):
            r = jax.block_until_ready(st.snap_after_dump(st.evolve_to_next_dump(r)))
            m = jax.block_until_ready(
                ms.snap_after_dump(ms.evolve_to_next_dump(m))
            )
            _assert_state_match(m, r)
            np.testing.assert_allclose(
                np.asarray(m.max_norm_err), np.asarray(r.max_norm_err), atol=1e-13
            )
    finally:
        fft_ops.set_default_mode("xla")


def test_sharded_engine_slab_and_plain_step(batch_psi0):
    """The (1,8,1) slab mesh runs the same combined-axis schedule; also
    covers the UNSKEWED 5-pass fused step (step() path) and the sharded
    Poisson solve (potential())."""
    p = _tuned_params()
    fft_ops.set_default_mode("mxu")
    try:
        st = Stepper(p, jnp.complex128, dt_mode="lagged")
        ms = MeshStepper(p, _mesh((1, 8, 1)), jnp.complex128, dt_mode="lagged")
        assert ms.stepper.sharded_engine
        r = jax.block_until_ready(st.init_state(batch_psi0))
        m = jax.block_until_ready(ms.init_state(batch_psi0))
        r = jax.block_until_ready(st.step(r))
        m = jax.block_until_ready(ms.step(m))
        _assert_state_match(m, r)
        pot_r = jax.block_until_ready(st.potential(r.psi))
        pot_m = jax.block_until_ready(ms.potential(m.psi))
        np.testing.assert_allclose(
            np.asarray(pot_m), np.asarray(pot_r), atol=1e-12
        )
    finally:
        fft_ops.set_default_mode("xla")


@pytest.mark.slow
def test_sharded_engine_expanding(batch_psi0):
    """Expanding-universe steps (double half-kick, a advanced between) on
    the engine mesh path."""
    cosmo = {"omega_matter_now": 0.3, "omega_radiation_now": 0.0, "h": 0.7,
             "z0": 19.0}
    p = _params(cosmology=cosmo, final_sim_time=0.2, num_data_dumps=1)
    fft_ops.set_default_mode("mxu")
    try:
        st = Stepper(p, jnp.complex128, dt_mode="exact")
        ms = MeshStepper(p, _mesh((2, 2, 2)), jnp.complex128, dt_mode="exact")
        assert ms.stepper.sharded_engine and ms.stepper.params.expanding
        r = jax.block_until_ready(st.init_state(batch_psi0))
        m = jax.block_until_ready(ms.init_state(batch_psi0))
        for _ in range(2):
            r = jax.block_until_ready(st.step(r))
            m = jax.block_until_ready(ms.step(m))
        np.testing.assert_allclose(np.asarray(m.psi), np.asarray(r.psi), atol=1e-12)
        np.testing.assert_allclose(np.asarray(m.a), np.asarray(r.a), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(m.tau), np.asarray(r.tau), rtol=1e-12)
    finally:
        fft_ops.set_default_mode("xla")


def test_sharded_engine_gating():
    """The engine engages only when the grid supports it: non-mxu FFT mode
    or a non-dividing device count fall back to the jnp.fft pencil path."""
    p = _params()
    # default (xla) mode: no engine
    ms = MeshStepper(p, _mesh((2, 2, 2)), jnp.complex128)
    assert not ms.stepper.sharded_engine
    fft_ops.set_default_mode("mxu")
    try:
        # dims must be 3
        p2 = _params(dims=2, size=128)
        ms2 = MeshStepper(p2, _mesh((1, 8, 1)), jnp.complex128)
        assert not ms2.stepper.sharded_engine
        # engine consts: sharded 2-D spec_axis12, placeholder full grids
        ms3 = MeshStepper(p, _mesh((2, 2, 2)), jnp.complex128)
        assert ms3.stepper.sharded_engine
        assert ms3.stepper.consts.spec_axis12.shape == (p.size, p.size)
        assert ms3.consts.spec_grid.shape == (1, 1, 1)
        assert ms3.consts.poisson_map is None
    finally:
        fft_ops.set_default_mode("xla")


@pytest.mark.slow
def test_sharded_engine_production_driver(tmp_path, monkeypatch):
    """The PRODUCTION driver (run_config mesh=auto -> MeshStepper engine
    path, interval-blocked mesh evolve, dump gather + manifests) over the
    sharded fused engine matches the single-device engine run dump for
    dump."""
    import json
    import os

    from msm_tpu import simulator

    p = _tuned_params(dumps=2)
    toml = cfg.parse_toml_dict(
        dict(
            axis_length=30.0,
            final_sim_time=p.final_sim_time,
            cfl=0.5,
            num_data_dumps=2,
            total_mass=1e8,
            sim_name="engprod",
            k2_cutoff=0.95,
            alias_threshold=0.5,
            dims=3,
            size=128,
            hbar_=0.02,
            ics={"type": "SphericalTophat", "radius": 5.0, "slope": 50,
                 "delta": 10},
            sampling={"seeds": "[1]", "scheme": "Wigner"},
        )
    )
    from msm_tpu.io.npy import load_complex_pair

    monkeypatch.setenv("MSM_INTERVAL_BLOCK", "2")
    fft_ops.set_default_mode("mxu")
    try:
        simulator.run_config(
            toml, dtype=jnp.complex128, data_root=str(tmp_path / "mesh"),
            mesh="auto",
        )
        simulator.run_config(
            toml, dtype=jnp.complex128, data_root=str(tmp_path / "single"),
            mesh="none",
        )
    finally:
        fft_ops.set_default_mode("xla")
    for name in ("engprod", "engprod-stream00001"):
        for dump in range(3):
            a = load_complex_pair(os.path.join(tmp_path, "mesh", name, f"psi_{dump:05d}"))
            b = load_complex_pair(
                os.path.join(tmp_path, "single", name, f"psi_{dump:05d}")
            )
            np.testing.assert_allclose(a, b, atol=1e-12)
        ma = json.load(open(os.path.join(tmp_path, "mesh", name, "manifest.json")))
        mb = json.load(open(os.path.join(tmp_path, "single", name, "manifest.json")))
        ma.pop("wall_time_ms"), mb.pop("wall_time_ms")
        assert ma == mb
        assert ma["current_dumps"] == 2


@pytest.mark.slow
def test_sharded_engine_radix2(rng):
    """R=2 (size 256) coverage: the radix butterflies' sharded s12 table
    slicing follows STORED engine order (residue-major chunks), which only
    differs from natural order when R > 1. One step on a (1,2,1) mesh must
    be bit-exact vs single-device, and the in-payload combine row's
    engine-order psik must be permuted to natural after the space gather.
    final_sim_time = half the kinetic dt so every interval is ONE
    dump-bound step (the combine section reuses the same steppers).
    ~10 min in interpret mode (step x2 + one interval program)."""
    from msm_tpu.grid import k2_max

    L, hbar_, cflv = 30.0, 0.05, 0.5
    dt_k = cflv * 2.0 * L / (math.sqrt(k2_max(L / 256, 3, 256)) * hbar_)
    base = dict(
        axis_length=L, final_sim_time=0.5 * dt_k, cfl=cflv, num_data_dumps=1,
        total_mass=1e8, sim_name="r2", k2_cutoff=0.95, alias_threshold=1e9,
        dims=3, size=256, hbar_=hbar_,
        ics={"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 10},
    )
    p = list(cfg.iter_stream_parameters(cfg.parse_toml_dict(base)))[-1]
    psi = rng.standard_normal((256,) * 3) + 1j * rng.standard_normal((256,) * 3)
    psi /= np.sqrt(np.sum(np.abs(psi) ** 2) * p.dx**3)
    fft_ops.set_default_mode("mxu")
    try:
        st = Stepper(p, jnp.complex128, dt_mode="lagged")
        r = jax.block_until_ready(st.step(st.init_state(psi)))
        devs = np.asarray(jax.devices()[:2]).reshape(1, 2, 1)
        ms = MeshStepper(
            p, Mesh(devs, ("stream", "x", "y")), jnp.complex128, dt_mode="lagged"
        )
        assert ms.stepper.sharded_engine
        m = jax.block_until_ready(ms.step(ms.init_state(psi[None])))
        np.testing.assert_allclose(
            np.asarray(m.psik)[0], np.asarray(r.psik), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(m.psi)[0], np.asarray(r.psi), atol=1e-12
        )

        # In-payload online-synthesis combine at R=2: the psik means travel
        # in ENGINE k-order inside the mesh program and are permuted to
        # natural order only AFTER the space gather — at R>1 a missing (or
        # per-shard) permute flips k modes. One dump-bound step (same ms);
        # the comb row must equal fields derived from the interval's own
        # final state (single-device comb rows are covered by
        # test_synthesis.test_online_matches_offline).
        from msm_tpu.ops import mxu_fft

        dv = p.dx**3
        final, outs = jax.block_until_ready(
            ms.evolve_intervals(ms.init_state(psi[None]), 1, combine=(2, dv))
        )
        assert float(outs["comb_n"][0]) == 1.0
        psi_f = np.asarray(final.psi)[0]
        psik_nat = (
            np.asarray(mxu_fft.to_natural(jnp.asarray(final.psik), 3))[0]
            * 256**1.5
        )
        comb_psi = np.asarray(outs["comb_psi_re"][0]) + 1j * np.asarray(
            outs["comb_psi_im"][0]
        )
        np.testing.assert_allclose(comb_psi, psi_f, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(outs["comb_psi2"][0]), np.abs(psi_f) ** 2, atol=1e-12
        )
        comb_psik = np.asarray(outs["comb_psik_re"][0]) + 1j * np.asarray(
            outs["comb_psik_im"][0]
        )
        np.testing.assert_allclose(comb_psik, psik_nat, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(outs["comb_psik2"][0]), np.abs(psik_nat) ** 2, atol=1e-9
        )
        # one-stream ensemble: the variance sum is identically ~0
        assert abs(float(outs["comb_qx"][0])) < 1e-10
    finally:
        fft_ops.set_default_mode("xla")
