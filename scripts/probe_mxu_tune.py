#!/usr/bin/env python
"""TPU probe: tune MXU FFT kernel knobs (block widths, matmul precision).

Run ON the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mxu_tune.py [size]

Per-call remote dispatch costs ~3-4 ms on the tunneled backend, so every
timed quantity is a CHAIN of `reps` applications inside ONE jitted
fori_loop; reported ms is per application. Errors are computed in-graph
(complex constants cannot cross the tunnel).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


log(f"devices: {jax.devices()}  size={SIZE}^3  reps={REPS}")

from msm_tpu.ops import mxu_fft  # noqa: E402


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


def chain(fn):
    """reps applications of fn inside one jit."""

    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, REPS, lambda i, v: fn(v), a)

    return run


def time_chain(fn, arg, label):
    run = chain(fn)
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


# baseline: XLA fftn/ifftn roundtrip, same chaining
t_xla = time_chain(
    lambda a: jnp.fft.ifftn(jnp.fft.fftn(a, norm="ortho"), norm="ortho"),
    x,
    "XLA roundtrip",
)

VARIANTS = [
    # (sublane_lanes, lane_rows, precision)
    (128, 256, "HIGHEST"),
    (256, 256, "HIGHEST"),
    (512, 256, "HIGHEST"),
    (1024, 256, "HIGHEST"),
    (512, 512, "HIGHEST"),
    (512, 1024, "HIGHEST"),
    (512, 512, "HIGH"),
    (1024, 1024, "HIGH"),
]

for lanes, rows, prec in VARIANTS:
    mxu_fft._SUBLANE_LANES = lanes
    mxu_fft._LANE_ROWS = rows
    mxu_fft._PRECISION = getattr(jax.lax.Precision, prec)
    log(f"variant lanes={lanes} rows={rows} prec={prec}")

    def lane(a):
        return jax.lax.complex(
            *mxu_fft._axis_pass_lane(jnp.real(a), jnp.imag(a), SIZE, False)
        )

    def sub1(a):
        return jax.lax.complex(
            *mxu_fft._axis_pass_sublane(jnp.real(a), jnp.imag(a), 1, False)
        )

    def sub0(a):
        return jax.lax.complex(
            *mxu_fft._axis_pass_sublane(jnp.real(a), jnp.imag(a), 0, False)
        )

    def rt(a):
        return mxu_fft.inverse_engine(mxu_fft.forward_engine(a, 3), 3)

    time_chain(lane, x, "lane pass")
    time_chain(sub1, x, "sublane axis1")
    time_chain(sub0, x, "sublane axis0")
    t = time_chain(rt, x, "roundtrip 3D")

    @jax.jit
    def errs(a):
        rt_err = jnp.abs(rt(a) - a).max()
        fwd = mxu_fft.to_natural(mxu_fft.forward_engine(a, 3), 3)
        ref = jnp.fft.fftn(a, norm="ortho")
        return rt_err, jnp.abs(fwd - ref).max()

    e_rt, e_f = errs(x)
    log(
        f"  => rt {t*1e3:.3f} ms ({t_xla/t:.2f}x vs XLA), "
        f"err_rt {float(np.asarray(e_rt)):.2e}, err_fwd {float(np.asarray(e_f)):.2e}"
    )

log("done")
