#!/usr/bin/env python
"""TPU probe: MXU CT-matmul FFT vs XLA FFT, roundtrip + full-step timing.

Run ON the chip: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mxu_fft.py [size]
Axon rules: jitted calls only; sync via jitted reduction + scalar fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


log(f"devices: {jax.devices()}  size={SIZE}^3")

from msm_tpu.ops import mxu_fft  # noqa: E402

# generate on-device (a 134 MB host upload over the tunnel stalls for
# tens of minutes); normalize so roundtrip errors are relative-scale
@jax.jit
def make_x(key):
    kr, ki = jax.random.split(key)
    shape = (SIZE,) * 3
    return jax.lax.complex(
        jax.random.normal(kr, shape, jnp.float32),
        jax.random.normal(ki, shape, jnp.float32),
    )


redsum = jax.jit(lambda a: jnp.real(a).sum())
t0 = time.perf_counter()
x = make_x(jax.random.key(0))
log(f"x ready on device in {time.perf_counter()-t0:.1f}s (sync...)")
log(f"sync value {float(np.asarray(redsum(x))):.3f}")


def sync(a):
    return float(np.asarray(redsum(a)))


def time_fn(fn, arg, label, reps=REPS):
    t0 = time.perf_counter()
    y = fn(arg)
    sync(y)
    log(f"{label}: compile+1st {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(y)
    sync(y)
    dt = (time.perf_counter() - t0) / reps
    log(f"{label}: {dt*1e3:.2f} ms/iter")
    return dt


@jax.jit
def mxu_rt(a):
    return mxu_fft.inverse_engine(mxu_fft.forward_engine(a, 3), 3)


@jax.jit
def xla_rt(a):
    return jnp.fft.ifftn(jnp.fft.fftn(a, norm="ortho"), norm="ortho")


@jax.jit
def mxu_fwd_only(a):
    # forward then conjugate-trick inverse-ish to keep shapes: just forward
    return mxu_fft.forward_engine(a, 3)


t_xla = time_fn(xla_rt, x, "XLA fftn+ifftn roundtrip")
t_mxu = time_fn(mxu_rt, x, "MXU fwd_engine+inv_engine roundtrip")
log(f"speedup roundtrip: {t_xla/t_mxu:.2f}x")

# correctness on-chip (roundtrip identity + vs XLA forward)
err = float(np.asarray(jax.jit(lambda a: jnp.abs(mxu_rt(a) - a).max())(x)))
log(f"roundtrip max err on chip: {err:.3e}")


@jax.jit
def cross_err(a):
    ref = jnp.fft.fftn(a, norm="ortho")
    got = mxu_fft.to_natural(mxu_fft.forward_engine(a, 3), 3)
    return jnp.abs(got - ref).max()


log(f"fwd vs XLA max err: {float(np.asarray(jax.jit(cross_err)(x))):.3e}")
log("done")
