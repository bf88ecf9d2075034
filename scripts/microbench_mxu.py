"""Per-pass MXU FFT microbenchmark (run ON the TPU).

Separates per-dispatch overhead from true pass cost by timing CHAINS of k
identical passes inside one jit call: slope over k = real per-pass time,
intercept = dispatch/launch overhead. Complex results never cross the
host link (axon cannot transfer complex) — all syncs are real-part sums.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_mxu.py [size]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync_val(out):
    red = jax.jit(
        lambda t: sum(
            jnp.sum(jnp.real(x)) for x in jax.tree_util.tree_leaves(t)
        )
    )
    return float(np.asarray(red(out)))


def timeit(fn, args, iters=20, label=""):
    out = fn(*args)
    _sync_val(out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync_val(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def chain(passfn, k):
    def run(a, b):
        for _ in range(k):
            a, b = passfn(a, b)
        return a, b

    return jax.jit(run)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from msm_tpu.ops import mxu_fft

    shape = (size, size, size)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    xi = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    print(f"grid {size}^3, precision={mxu_fft._PRECISION}", flush=True)

    # dispatch floor: trivial scalar op
    timeit(jax.jit(lambda a, b: (jnp.sum(a[0, 0]), b)), (xr, xi), label="dispatch floor (tiny op)")

    # Pure-copy Pallas pass: the DMA floor for one read+write of the planes.
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _copy_kernel(ar, br, co, do):
        co[...] = ar[...]
        do[...] = br[...]

    def copy_pass(a, b):
        m = a.shape[0]
        spec = pl.BlockSpec(
            (1,) + a.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            _copy_kernel,
            grid=(m,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype)] * 2,
            interpret=mxu_fft._interpret(),
        )(a, b)

    ew = lambda a, b: (a + 1.0, b + 1.0)
    f2 = lambda a, b: mxu_fft._axis_pass_fused2(a, b, inverse=False)
    sub = lambda a, b: mxu_fft._axis_pass_sublane(a, b, 0, inverse=False)
    # Long chains inside one jit: slope over k isolates the true per-pass
    # cost from the ~20 ms tunneled-dispatch floor (x1-vs-x4 cannot).
    K_LO, K_HI = 4, 16
    for name, passfn in (
        ("copy pass", copy_pass),
        ("xla elementwise", ew),
        ("fused2", f2),
        ("sublane", sub),
    ):
        tl = timeit(chain(passfn, K_LO), (xr, xi), label=f"{name} x{K_LO}")
        th = timeit(chain(passfn, K_HI), (xr, xi), label=f"{name} x{K_HI}")
        print(
            f"  -> {name}: per-pass {(th - tl) / (K_HI - K_LO) * 1e3:.3f} ms",
            flush=True,
        )

    # Poisson roundtrip pass (pmap threaded as an argument, not a capture)
    spec_c = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    def chain_rt(k):
        def run(a, b, s):
            for _ in range(k):
                a, b = mxu_fft._axis_pass_sublane_roundtrip_pmap(a, b, 0, s)
            return a, b

        return jax.jit(run)

    tl = timeit(chain_rt(K_LO), (xr, xi, spec_c), label=f"poisson roundtrip x{K_LO}")
    th = timeit(chain_rt(K_HI), (xr, xi, spec_c), label=f"poisson roundtrip x{K_HI}")
    print(
        f"  -> poisson roundtrip: per-pass {(th - tl) / (K_HI - K_LO) * 1e3:.3f} ms",
        flush=True,
    )

    # full transforms, planar in/out (no complex crossing jit boundaries)
    fwd3 = jax.jit(
        lambda a, b: tuple(
            map(
                lambda z: (jnp.real(z), jnp.imag(z)),
                (mxu_fft.forward_engine(jax.lax.complex(a, b), 3),),
            )
        )[0]
    )
    timeit(fwd3, (xr, xi), label="forward_engine 3-D")
    roundtrip = jax.jit(
        lambda a, b: (
            lambda z: (jnp.real(z), jnp.imag(z))
        )(
            mxu_fft.inverse_engine(
                mxu_fft.forward_engine(jax.lax.complex(a, b), 3), 3
            )
        )
    )
    timeit(roundtrip, (xr, xi), label="mxu roundtrip 3-D")
    xla_rt = jax.jit(
        lambda a, b: (
            lambda z: (jnp.real(z), jnp.imag(z))
        )(
            jnp.fft.ifftn(
                jnp.fft.fftn(jax.lax.complex(a, b), axes=(-3, -2, -1)),
                axes=(-3, -2, -1),
            )
        )
    )
    timeit(xla_rt, (xr, xi), label="xla fft roundtrip 3-D")

    # the fused step interludes
    spec = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    invk = jax.jit(
        lambda a, b, s: (
            lambda z: (jnp.real(z), jnp.imag(z))
        )(
            mxu_fft.inverse_engine(
                jax.lax.complex(a, b), 3, kphase=(s, jnp.float32(0.01))
            )
        )
    )
    timeit(invk, (xr, xi, spec), label="inverse_engine + fused kphase")
    fwdd = jax.jit(
        lambda a, b: (
            lambda z: (jnp.real(z), jnp.imag(z))
        )(mxu_fft.forward_engine_density(jax.lax.complex(a, b), 3, 2.0))
    )
    timeit(fwdd, (xr, xi), label="forward_engine_density 3-D")
    invp = jax.jit(
        lambda a, b, s: mxu_fft.inverse_engine_real(
            jax.lax.complex(a, b), 3, pmap=s
        )
    )
    timeit(invp, (xr, xi, spec), label="inverse_engine_real + fused pmap")


if __name__ == "__main__":
    main()
