#!/usr/bin/env python
"""TPU probe: time one KDK step at a given size with the current MSM_FFT.

Usage: MSM_FFT=mxu python scripts/probe_step.py SIZE [steps]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 15


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


log(f"devices {jax.devices()} size={SIZE}^3 MSM_FFT={os.environ.get('MSM_FFT','xla')}")

from msm_tpu import config as cfg  # noqa: E402
from msm_tpu.stepper import Stepper  # noqa: E402

toml = cfg.TomlParameters(
    axis_length=30.0, final_sim_time=1e9, cfl=0.5, num_data_dumps=1,
    total_mass=1e11, sim_name="probe", k2_cutoff=0.95, alias_threshold=1e9,
    dims=3, size=SIZE, ics=cfg.SphericalTophat(radius=5.0, delta=100.0, slope=50.0),
    hbar_=0.05,
)
p = cfg.resolve_parameters(toml)
st = Stepper(p, jnp.complex64, dt_mode=os.environ.get("MSM_DT", "exact"))
log(f"use_mxu={st.use_mxu} dt_mode={st.dt_mode}")


@jax.jit
def make_psi(key):
    kr, ki = jax.random.split(key)
    shape = (SIZE,) * 3
    z = jax.lax.complex(
        jax.random.normal(kr, shape, jnp.float32),
        jax.random.normal(ki, shape, jnp.float32),
    )
    n = jnp.sqrt(jnp.sum(jnp.abs(z) ** 2) * p.dx**3)
    return z / n.astype(z.dtype)


redsum = jax.jit(lambda a: jnp.real(a).sum())
t0 = time.perf_counter()
psi0 = make_psi(jax.random.key(0))
log(f"psi dispatched {time.perf_counter()-t0:.1f}s")
state = st._jit_init_z(psi0, st.consts)
log(f"init dispatched; sync {float(np.asarray(redsum(state.psi))):.4f}")

t0 = time.perf_counter()
state = st.step(state)
v = float(np.asarray(redsum(state.psi)))
log(f"step compile+first: {time.perf_counter()-t0:.1f}s (val {v:.4f})")

sync_every = max(1, (6 << 30) // (2 * SIZE**3 * 8))
t0 = time.perf_counter()
for i in range(STEPS):
    state = st.step(state)
    if (i + 1) % sync_every == 0:
        float(np.asarray(redsum(state.psi)))
float(np.asarray(redsum(state.psi)))
dt = (time.perf_counter() - t0) / STEPS
log(f"step: {dt*1e3:.2f} ms -> {SIZE**3/dt:.3e} cell-updates/s")
log(f"norm drift: {abs(float(np.asarray(redsum(jnp.abs(state.psi)**2)))*p.dx**3 - 1):.2e}")
log("done")
