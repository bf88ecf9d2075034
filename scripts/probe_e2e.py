#!/usr/bin/env python
"""TPU probe: reference e2e example cold vs warm (same process).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_e2e.py
"""
import time

import jax.numpy as jnp

from msm_tpu import config as cfg
from msm_tpu import simulator

toml = cfg.parse_toml_str(
    open("/root/reference/examples/spherical-tophat.toml").read()
)
t0 = time.perf_counter()
simulator.run_config(toml, dtype=jnp.complex64, data_root="/tmp/e2e_w1")
print(f"cold: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
simulator.run_config(toml, dtype=jnp.complex64, data_root="/tmp/e2e_w2")
print(f"warm: {time.perf_counter()-t0:.1f}s", flush=True)
