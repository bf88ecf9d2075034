#!/usr/bin/env python
"""TPU probe: per-pass timing of the skewed 4-pass fused step.

Run ON the chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/probe_skew_passes.py [size] [reps]

Relay rules honored (CLAUDE.md): every call threads a FRESH scalar tag
into its inputs (repeated identical (executable, inputs) pairs are served
from a result cache), grid-sized arrays travel as jit ARGUMENTS (closure
captures get embedded in the serialized MLIR — payload rejection at
512^3), each pass is a fori_loop chain feeding its own output forward,
and the cost is the slope between two trip counts. Sync via jitted
reduction + scalar fetch.
"""

import itertools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


log(f"devices: {jax.devices()}  size={SIZE}^3")

from msm_tpu.ops import mxu_fft  # noqa: E402

N = SIZE
k1d = np.square(2.0 * np.pi * np.fft.fftfreq(N, d=1.0 / N)).astype(np.float32)
s1d = np.take(k1d, mxu_fft.engine_perm(N))
S0 = jnp.asarray(s1d)
S12 = jnp.asarray((s1d[:, None] + s1d[None, :]).reshape(-1))
KC = jnp.asarray([1e-6], jnp.float32)
VC = jnp.asarray([1e-4], jnp.float32)
CUT = float(2.85 * k1d.max())


@jax.jit
def make_pair(key):
    kr, ki = jax.random.split(key)
    shape = (N,) * 3
    return (
        jax.random.normal(kr, shape, jnp.float32),
        jax.random.normal(ki, shape, jnp.float32),
    )


redsum = jax.jit(lambda a: a.sum())


def sync(a):
    return float(np.asarray(redsum(a)))


XR, XI = make_pair(jax.random.key(0))
sync(XR)

_tags = itertools.count(1)
ax0 = 0


def timeit(name, chain):
    fn = jax.jit(chain)

    def run(n):
        tag = jnp.float32(1e-30 * next(_tags))  # fresh inputs per call
        t0 = time.perf_counter()
        out = fn(XR, XI, S0, S12, tag, n)
        sync(out[0])
        return time.perf_counter() - t0

    lo, hi = 3, 3 + REPS
    run(lo)  # compile + warm
    best = float("inf")
    for _ in range(2):
        t_lo = run(lo)
        t_hi = run(hi)
        best = min(best, (t_hi - t_lo) / REPS)
    gb = 2 * N**3 * 4 * 2 / 1e9  # read+write of both planes
    log(f"{name}: {best*1e3:.3f} ms  ({gb/best:.0f} GB/s apparent)")
    return best


# pass A: cross-step roundtrip + kick + reductions
def chain_a(r, i, s0, s12, tag, n):
    def body(_, c):
        r2, i2, ns, am = mxu_fft._axis_pass_sublane_roundtrip_kick_reduce_sep(
            c[0], c[1], ax0, s0, s12, KC, CUT
        )
        return (r2, i2)

    return lax.fori_loop(0, n, body, (r + tag, i))


# plain sublane pair for comparison (old pass 1 + pass 5 equivalent)
def chain_15(r, i, s0, s12, tag, n):
    def body(_, c):
        r2, i2 = mxu_fft._axis_pass_sublane_inv_kphase_sep(
            c[0], c[1], ax0, s0, s12, KC
        )
        r3, i3, ns, am = mxu_fft._axis_pass_sublane_fwd_reduce_sep(
            r2, i2, ax0, s0, s12, CUT
        )
        return (r3, i3)

    return lax.fori_loop(0, n, body, (r + tag, i))


# pass 2: fused2 inverse + in-register density forward
def chain_p2(r, i, s0, s12, tag, n):
    def body(_, c):
        pr, pi, dr, di = mxu_fft._axis_pass_fused2_inv_density(c[0], c[1], 2.0)
        return (dr, di)

    return lax.fori_loop(0, n, body, (r + tag, i))


# pass 3: axis-0 Poisson roundtrip
def chain_p3(r, i, s0, s12, tag, n):
    def body(_, c):
        dr, di = mxu_fft._axis_pass_sublane_roundtrip_poisson_sep(
            c[0], c[1], ax0, s0, s12, 0.7
        )
        return (dr, di)

    return lax.fori_loop(0, n, body, (r + tag, i))


# pass 4: phi inverse + potential kick + fused2 forward (the psi planes
# ride as the same jit ARGUMENTS r/i — shapes are all that matter here)
def chain_p4(r, i, s0, s12, tag, n):
    def body(_, c):
        qr, qi, mx = mxu_fft._axis_pass_fused2_potkick_fwd(c[0], c[1], r, i, VC)
        return (qr, qi)

    return lax.fori_loop(0, n, body, (r + tag, i))


t_a = timeit("pass A (roundtrip+kick+reduce)", chain_a)
t_15 = timeit("pass1+pass5 (old pair)", chain_15)
t_2 = timeit("pass 2 (fused2 inv+density)", chain_p2)
t_3 = timeit("pass 3 (poisson roundtrip)", chain_p3)
t_4 = timeit("pass 4 (phi inv+kick+fwd)", chain_p4)
log(
    f"sum A+2+3+4 = {(t_a+t_2+t_3+t_4)*1e3:.3f} ms "
    f"(old 1+5+2+3+4 = {(t_15+t_2+t_3+t_4)*1e3:.3f} + 2 conversion passes)"
)
