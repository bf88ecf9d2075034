#!/usr/bin/env python
"""TPU probe: locate the MXU FFT kernel bottleneck.

Times (a) the roundtrip at DEFAULT matmul precision (1-pass bf16 — the MXU
floor), (b) a pure-copy Pallas kernel over the same blocks (the DMA floor),
(c) the HIGHEST-precision roundtrip for reference.
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


log(f"devices: {jax.devices()}  size={SIZE}^3  reps={REPS}")

from msm_tpu.ops import mxu_fft  # noqa: E402

mxu_fft._SUBLANE_LANES = 512
mxu_fft._LANE_ROWS = 256


@jax.jit
def make_x(key):
    kr, ki = jax.random.split(key)
    shape = (SIZE,) * 3
    return jax.lax.complex(
        jax.random.normal(kr, shape, jnp.float32),
        jax.random.normal(ki, shape, jnp.float32),
    )


redsum = jax.jit(lambda a: jnp.real(a).sum())
x = make_x(jax.random.key(0))
log(f"x sync {float(np.asarray(redsum(x))):.3f}")


def sync(a):
    return float(np.asarray(redsum(a)))


def time_chain(fn, arg, label):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, REPS, lambda i, v: fn(v), a)

    t0 = time.perf_counter()
    y = run(arg)
    sync(y)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    y = run(y)
    sync(y)
    dt = (time.perf_counter() - t0) / REPS
    log(f"  {label}: {dt*1e3:.3f} ms/app (compile+1st {c:.1f}s)")
    return dt


def rt(a):
    return mxu_fft.inverse_engine(mxu_fft.forward_engine(a, 3), 3)


log("HIGHEST precision:")
time_chain(rt, x, "roundtrip 3D")

log("DEFAULT precision (1-pass bf16, MXU floor):")
mxu_fft._PRECISION = jax.lax.Precision.DEFAULT
time_chain(rt, x, "roundtrip 3D")
mxu_fft._PRECISION = jax.lax.Precision.HIGHEST


# --- DMA floor: copy both planes through the same block geometry ---
def _copy_kernel(xr_ref, xi_ref, or_ref, oi_ref):
    or_ref[...] = xr_ref[...]
    oi_ref[...] = xi_ref[...]


def copy_pass_lane(a):
    xr, xi = jnp.real(a), jnp.imag(a)
    rows = SIZE * SIZE
    xr2 = xr.reshape(rows, SIZE)
    xi2 = xi.reshape(rows, SIZE)
    rb = 256
    spec = pl.BlockSpec((rb, SIZE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _copy_kernel,
        grid=(rows // rb,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, SIZE), xr.dtype),
            jax.ShapeDtypeStruct((rows, SIZE), xr.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=mxu_fft._VMEM_LIMIT
        ),
    )(xr2, xi2)
    return jax.lax.complex(
        out[0].reshape(a.shape), out[1].reshape(a.shape)
    )


def copy6(a):
    for _ in range(6):
        a = copy_pass_lane(a)
    return a


log("DMA floor (6 copy passes, same geometry):")
time_chain(copy6, x, "6x copy")

# butterfly-only: matmuls replaced by pass-through of s chunks
log("done")
