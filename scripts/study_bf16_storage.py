#!/usr/bin/env python
"""Error-accumulation study: bf16 storage for psi between steps.

VERDICT round-2 item 10 / CLAUDE.md priority 4: storing the state grids in
bfloat16 (with f32 twiddles/accumulation inside the step) would halve HBM
traffic on the FFT-bound KDK step. This study quantifies the cost: evolve
the same IC with psi/psik ROUND-TRIPPED through bf16 after every step
(simulating bf16 HBM storage + f32 compute) and compare against the f32
trajectory and the reference's check_norm budget (eps = 1e-4,
`simulator/src/utils/grid.rs:35-64`).

Run on CPU: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/study_bf16_storage.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from msm_tpu import config as cfg
from msm_tpu.models.ics import build_ics
from msm_tpu.stepper import Stepper


def params(size=64, dims=3):
    toml = cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=1e9,
        cfl=0.5,
        num_data_dumps=1,
        total_mass=1e11,
        sim_name="bf16study",
        k2_cutoff=0.95,
        alias_threshold=1e9,
        dims=dims,
        size=size,
        ics=cfg.SphericalTophat(radius=5.0, delta=100.0, slope=50.0),
        hbar_=0.05,
    )
    return cfg.resolve_parameters(toml)


@jax.jit
def quantize_bf16(z):
    """Round-trip a complex64 grid through bf16 planes (storage model)."""
    re = jnp.real(z).astype(jnp.bfloat16).astype(jnp.float32)
    im = jnp.imag(z).astype(jnp.bfloat16).astype(jnp.float32)
    return jax.lax.complex(re, im)


def main():
    p = params()
    st = Stepper(p, jnp.complex64)
    psi0 = build_ics(p)
    s32 = st.init_state(psi0)
    s16 = st.init_state(psi0)

    dx_d = p.dx**p.dims
    steps = 200
    print("step  norm_err_f32  norm_err_bf16  rel_field_err(bf16 vs f32)", flush=True)
    t0 = time.time()
    for i in range(1, steps + 1):
        s32 = st.step(s32)
        s16 = st.step(s16)
        import dataclasses

        s16 = dataclasses.replace(
            s16, psi=quantize_bf16(s16.psi), psik=quantize_bf16(s16.psik)
        )
        if i % 25 == 0 or i == 1:
            n32 = float(jnp.sum(jnp.abs(s32.psi) ** 2) * dx_d)
            n16 = float(jnp.sum(jnp.abs(s16.psi) ** 2) * dx_d)
            rel = float(
                jnp.linalg.norm((s16.psi - s32.psi).ravel())
                / jnp.linalg.norm(s32.psi.ravel())
            )
            print(
                f"{i:4d}  {abs(n32-1):.3e}     {abs(n16-1):.3e}      {rel:.3e}",
                flush=True,
            )
    print(f"elapsed {time.time()-t0:.1f}s", flush=True)
    print(
        "check_norm budget (reference grid.rs:35-64): 1e-4 — bf16 storage "
        "fails it if norm_err_bf16 above exceeds 1e-4.",
        flush=True,
    )


if __name__ == "__main__":
    main()
