"""1024^3 structural proof: AOT-lower the sharded fused engine at target
scale without allocating a single grid (VERDICT r3 item 4).

One v5e cannot hold a 1024^3 c64 state (psi+psik = 17.2 GiB); the design
claim (CLAUDE.md) is >= 4 chips via the sharded engine. This lowers — no
execution, no XLA compile — the full production interval-block program
(skewed fused engine, 4 kernels + 4 all_to_alls per step, donation,
payload space-gathers) over the (2, 2, 2) virtual mesh with
ShapeDtypeStruct inputs, proving the StepConsts / payload / tracing
budgets hold at the target scale: a regression that breaks 1024^3 (an
accidentally materialized N^3 constant, a payload-shape blowup, a
radix-8 tracing error) fails here instead of on a pod slice.

Memory plan it certifies (documented in BASELINE.md): per device on a
(stream=2, x=2, y=2) mesh each chip holds one stream's psi+psik shard
(2 x 1024^3/4 x 8 B = 4.3 GiB) plus the k-interval dump payload — within
a v5e's 16 GiB with donation.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from msm_tpu import config as cfg
from msm_tpu.ops import fft as fft_ops
from msm_tpu.parallel.mesh import SPACE2_AXIS, SPACE_AXIS, STREAM_AXIS
from msm_tpu.parallel.sharded import MeshStepper
from msm_tpu.stepper import SimState


def _params(size):
    toml = cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=1.0,
        cfl=0.5,
        num_data_dumps=4,
        total_mass=1e11,
        sim_name="scale",
        k2_cutoff=0.95,
        alias_threshold=0.5,
        dims=3,
        size=size,
        ics=cfg.ColdGauss(mean=(15.0,) * 3, std=(3.0,) * 3),
        hbar_=0.05,
    )
    return cfg.resolve_parameters(toml)


def _abstract_state(ms: MeshStepper, batch: int) -> SimState:
    p = ms.params
    grid = (batch,) + (p.size,) * p.dims
    st = ms.stepper

    def g(dt):
        return jax.ShapeDtypeStruct(grid, dt)

    def s(dt):
        return jax.ShapeDtypeStruct((batch,), dt)

    return SimState(
        psi=g(st.dtype),
        psik=g(st.dtype),
        time=s(st.tdtype),
        tau=s(st.tdtype),
        a=s(st.tdtype),
        current_dumps=s(jnp.int32),
        n_steps=s(jnp.int32),
        just_dumped=s(jnp.bool_),
        aliased=s(jnp.bool_),
        alias_mass=s(st.rdtype),
        phi_max=s(st.tdtype),
        phi_ref=s(st.tdtype),
        norm0=s(st.rdtype),
        max_norm_err=s(st.rdtype),
        pending_k=s(st.rdtype),
        dt_min=s(st.tdtype),
        dt_max=s(st.tdtype),
        replays=s(jnp.int32),
    )


@pytest.mark.parametrize("size", [1024])
def test_lower_sharded_interval_block_at_scale(size):
    fft_ops.set_default_mode("mxu")
    try:
        p = _params(size)
        devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
        mesh = Mesh(devs, (STREAM_AXIS, SPACE_AXIS, SPACE2_AXIS))
        ms = MeshStepper(p, mesh, jnp.complex64, dt_mode="optimistic")
        # the target-scale path must be the fused sharded engine with the
        # skewed loop — anything else means the production path regressed
        assert ms.stepper.sharded_engine and ms.stepper.skew
        # no N^3 constant may exist anywhere in the consts pytree
        biggest = max(
            int(np.prod(leaf.shape))
            for leaf in jax.tree_util.tree_leaves(ms.consts)
        )
        assert biggest <= size * size  # separable tables only

        state = _abstract_state(ms, batch=2)
        lowered = ms._interval_fn(k=2, with_potential=False).lower(
            state, ms.consts
        )
        assert lowered is not None
        # the lowered module must contain the mesh collectives (the
        # all_to_all relayouts of the combined-axis engine)
        txt = lowered.as_text()
        assert "all_to_all" in txt
        assert "all_gather" in txt  # payload space-gathers
    finally:
        fft_ops.set_default_mode("xla")


def test_lower_single_device_exceeds_one_chip_note():
    """Documented memory plan sanity: the 1024^3 single-device state alone
    (psi + psik, c64) already equals a v5e's entire 16 GiB — leaving zero
    HBM for kernel workspace, payload or XLA scratch — so the sharded
    engine is not optional at this scale."""
    bytes_state = 2 * 1024**3 * 8
    assert bytes_state >= 16 * 2**30
