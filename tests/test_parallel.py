"""Distributed-path tests on an 8-virtual-device CPU mesh: pencil FFT parity
with jnp.fft, and MeshStepper equivalence with the single-device Stepper.

The reference has zero automated distributed tests (SURVEY.md §4); this is
the multi-chip story the driver's dryrun also exercises."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu.models.ics import build_ics
from msm_tpu.parallel import pfft
from msm_tpu.parallel.mesh import SPACE_AXIS, STREAM_AXIS, make_mesh
from msm_tpu.parallel.sharded import MeshStepper
from msm_tpu.stepper import Stepper

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh(n_stream, n_space):
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[: n_stream * n_space]).reshape(n_stream, n_space)
    return Mesh(devs, (STREAM_AXIS, SPACE_AXIS))


@pytest.mark.parametrize("dims", [2, 3])
@pytest.mark.parametrize("n_space", [2, 4])
def test_pfft_matches_fftn(rng, dims, n_space):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh(1, n_space)
    size = 16
    shape = (2,) + (size,) * dims  # leading batch axis
    x = jnp.asarray(
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape), jnp.complex128
    )

    can_spec = P(None, SPACE_AXIS, *([None] * (dims - 1)))
    tr_spec = P(None, None, SPACE_AXIS, *([None] * (dims - 2)))

    fwd = jax.jit(
        jax.shard_map(
            lambda a: pfft.fftn_sharded(a, dims, SPACE_AXIS),
            mesh=mesh,
            in_specs=(can_spec,),
            out_specs=tr_spec,
            check_vma=False,
        )
    )
    inv = jax.jit(
        jax.shard_map(
            lambda a: pfft.ifftn_sharded(a, dims, SPACE_AXIS),
            mesh=mesh,
            in_specs=(tr_spec,),
            out_specs=can_spec,
            check_vma=False,
        )
    )

    xs = jax.device_put(x, NamedSharding(mesh, can_spec))
    xk = fwd(xs)
    expected = np.fft.fftn(np.asarray(x), axes=tuple(range(-dims, 0)), norm="ortho")
    np.testing.assert_allclose(np.asarray(xk), expected, atol=1e-12)

    back = inv(xk)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-12)


def _toml(dims=3, size=16):
    return cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=2.0,
        cfl=0.5,
        num_data_dumps=5,
        total_mass=1e10,
        sim_name="mesh",
        k2_cutoff=0.95,
        alias_threshold=0.5,
        dims=dims,
        size=size,
        ics=cfg.SphericalTophat(radius=5.0, delta=10.0, slope=50.0),
        hbar_=0.05,
        ntot=1e8,
    )


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 4)])
def test_mesh_stepper_matches_single_device(mesh_shape):
    toml = _toml()
    p = cfg.resolve_parameters(toml)
    mesh = _mesh(*mesh_shape)

    psi0 = build_ics(p)
    n_streams = 8
    rng = np.random.default_rng(5)
    batch = np.stack(
        [
            psi0 * np.exp(0.1j * rng.standard_normal() * np.ones(p.shape))
            for _ in range(n_streams)
        ]
    )

    single = Stepper(p, jnp.complex128)
    s_state = single.init_state(batch, batched=True)
    s_state = single.snap_after_dump(single.evolve_to_next_dump(s_state))

    msstep = MeshStepper(p, mesh, jnp.complex128)
    m_state = msstep.init_state(batch)
    m_state = msstep.snap_after_dump(msstep.evolve_to_next_dump(m_state))

    np.testing.assert_allclose(
        np.asarray(m_state.time), np.asarray(s_state.time), rtol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(m_state.current_dumps), np.asarray(s_state.current_dumps)
    )
    np.testing.assert_allclose(
        msstep.gather_psi(m_state), np.asarray(s_state.psi), atol=1e-10
    )


def test_mesh_optimistic_forced_replay():
    """The optimistic-dt validated replay on a MESH: an understated
    carried bound forces >=1 per-stream replay (the fused where-select
    revert, validated against a pmax over the space axes); trajectory,
    replay counts and step counts must match the single-device run
    (single-device forced replay: test_stepper.py
    test_optimistic_dt_potential_bound_validation_and_replay)."""
    import dataclasses

    toml = _toml()
    toml = dataclasses.replace(
        toml, total_mass=5e12, final_sim_time=0.5, num_data_dumps=2, cfl=0.4
    )
    p = cfg.resolve_parameters(toml)
    mesh = _mesh(2, 4)
    psi0 = np.asarray(build_ics(p))
    batch = np.stack([psi0, np.roll(psi0, 3, axis=0)])

    single = Stepper(p, jnp.complex128, dt_mode="optimistic")
    ms = MeshStepper(p, mesh, jnp.complex128, dt_mode="optimistic")
    s0 = single.init_state(batch, batched=True)
    m0 = ms.init_state(batch)
    tiny = 1e-30
    s0 = dataclasses.replace(s0, phi_max=jnp.zeros_like(s0.phi_max) + tiny)
    m0 = dataclasses.replace(m0, phi_max=jnp.zeros_like(m0.phi_max) + tiny)
    s1 = single.evolve_to_next_dump(s0)
    m1 = ms.evolve_to_next_dump(m0)
    assert int(np.asarray(s1.replays).max()) >= 1
    np.testing.assert_array_equal(
        np.asarray(m1.replays), np.asarray(s1.replays)
    )
    np.testing.assert_array_equal(
        np.asarray(m1.n_steps), np.asarray(s1.n_steps)
    )
    np.testing.assert_allclose(
        ms.gather_psi(m1), np.asarray(s1.psi), atol=1e-10
    )


def test_mesh_stepper_expanding():
    toml = cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=40.0,
        cfl=0.5,
        num_data_dumps=4,
        total_mass=1e11,
        sim_name="mesh-cosmo",
        k2_cutoff=0.95,
        alias_threshold=0.5,
        dims=3,
        size=16,
        ics=cfg.SphericalTophat(radius=5.0, delta=10.0, slope=50.0),
        hbar_=0.05,
        cosmology=cfg.CosmologyConfig(
            omega_matter_now=0.7, omega_radiation_now=0.0, h=0.7, z0=1.0
        ),
    )
    p = cfg.resolve_parameters(toml)
    mesh = _mesh(2, 4)

    psi0 = build_ics(p)
    batch = np.broadcast_to(psi0[None], (4,) + psi0.shape)

    single = Stepper(p, jnp.complex128)
    s_state = single.snap_after_dump(
        single.evolve_to_next_dump(single.init_state(batch, batched=True))
    )
    msstep = MeshStepper(p, mesh, jnp.complex128)
    m_state = msstep.snap_after_dump(msstep.evolve_to_next_dump(msstep.init_state(batch)))

    np.testing.assert_allclose(
        np.asarray(m_state.a), np.asarray(s_state.a), rtol=1e-12
    )
    np.testing.assert_allclose(
        msstep.gather_psi(m_state), np.asarray(s_state.psi), atol=1e-10
    )


def test_size_divisibility_validation():
    toml = _toml(size=10)
    p = cfg.resolve_parameters(toml)
    with pytest.raises(ValueError, match="not divisible"):
        MeshStepper(p, _mesh(2, 4), jnp.complex128)


# ---------------------------------------------------------------------------
# 2-D pencil decomposition (parallel/pfft.fftn_pencil)
# ---------------------------------------------------------------------------

from msm_tpu.parallel.mesh import SPACE2_AXIS


def _mesh3(n_stream, px, py):
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[: n_stream * px * py]).reshape(
        n_stream, px, py
    )
    return Mesh(devs, (STREAM_AXIS, SPACE_AXIS, SPACE2_AXIS))


@pytest.mark.parametrize("px,py", [(2, 2), (2, 4), (4, 2)])
def test_pencil_fft_matches_fftn(rng, px, py):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh3(1, px, py)
    size = 16
    shape = (2, size, size, size)
    x = jnp.asarray(
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape),
        jnp.complex128,
    )
    can_spec = P(None, SPACE_AXIS, SPACE2_AXIS, None)
    tr_spec = P(None, None, SPACE_AXIS, SPACE2_AXIS)
    names = (SPACE_AXIS, SPACE2_AXIS)

    fwd = jax.jit(
        jax.shard_map(
            lambda a: pfft.fftn_pencil(a, 3, names),
            mesh=mesh,
            in_specs=(can_spec,),
            out_specs=tr_spec,
            check_vma=False,
        )
    )
    inv = jax.jit(
        jax.shard_map(
            lambda a: pfft.ifftn_pencil(a, 3, names),
            mesh=mesh,
            in_specs=(tr_spec,),
            out_specs=can_spec,
            check_vma=False,
        )
    )
    xs = jax.device_put(x, NamedSharding(mesh, can_spec))
    xk = fwd(xs)
    expected = np.fft.fftn(np.asarray(x), axes=(-3, -2, -1), norm="ortho")
    np.testing.assert_allclose(np.asarray(xk), expected, atol=1e-12)
    np.testing.assert_allclose(np.asarray(inv(xk)), np.asarray(x), atol=1e-12)


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 2, 4), (1, 4, 2)])
def test_mesh_stepper_pencil_matches_single_device(mesh_shape):
    """The full KDK evolve-to-dump loop over a (stream, x, y) pencil mesh
    equals the single-device run — the VERDICT round-2 'done' bar."""
    toml = _toml()
    p = cfg.resolve_parameters(toml)
    mesh = _mesh3(*mesh_shape)

    psi0 = build_ics(p)
    n_streams = 2
    rng = np.random.default_rng(5)
    batch = np.stack(
        [
            psi0 * np.exp(0.1j * rng.standard_normal() * np.ones(p.shape))
            for _ in range(n_streams)
        ]
    )

    single = Stepper(p, jnp.complex128)
    s_state = single.init_state(batch, batched=True)
    s_state = single.snap_after_dump(single.evolve_to_next_dump(s_state))

    msstep = MeshStepper(p, mesh, jnp.complex128)
    assert msstep.shard_space and len(msstep.space_axes) == 2
    m_state = msstep.init_state(batch)
    m_state = msstep.snap_after_dump(msstep.evolve_to_next_dump(m_state))

    np.testing.assert_allclose(
        np.asarray(m_state.time), np.asarray(s_state.time), rtol=1e-12
    )
    np.testing.assert_allclose(
        msstep.gather_psi(m_state), np.asarray(s_state.psi), atol=1e-11
    )
    # gather_spatial replicates grids over the space axes for dumping
    g = msstep.gather_spatial(m_state.psi)
    from msm_tpu.parallel.mesh import write_owner_indices

    owned = write_owner_indices(g)
    assert owned == list(range(n_streams))  # single process owns all
    np.testing.assert_allclose(np.asarray(g), np.asarray(s_state.psi), atol=1e-11)
