"""Per-pass MXU FFT microbenchmark (run ON the TPU).

Axon relay gotchas (measured, round 2):
  * each jit CALL costs ~20-500 ms of blocking host time (jittery);
  * repeat calls with IDENTICAL executable + inputs appear to be served
    from a result cache — chains of k dispatches, and even repeated
    single dispatches, show zero slope in k.

So the only honest measurement is: ONE program containing the whole chain
(lax.fori_loop), a FRESH scalar input per call (defeats result reuse),
long chains (execution ≫ floor jitter), and the slope between two chain
lengths. Complex results never cross the host link (axon cannot transfer
complex) — all syncs are real-part sums.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_mxu.py [size]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sync_val(out):
    red = jax.jit(
        lambda t: sum(
            jnp.sum(jnp.real(x)) for x in jax.tree_util.tree_leaves(t)
        )
    )
    return float(np.asarray(red(out)))


_CALL_ID = [0]


def _fresh():
    """A new tiny scalar per call: folded into the input so no two calls
    are identical programs-on-identical-buffers (relay result reuse)."""
    _CALL_ID[0] += 1
    return jnp.float32(_CALL_ID[0] * 1e-30)


def timeit_once(fn, args, repeats=3, label=""):
    """min over repeats of (dispatch + execute + fetch); fn takes
    (*args, eps) with eps varying per call."""
    _sync_val(fn(*args, _fresh()))  # compile + sync
    best = float("inf")
    for _ in range(repeats):
        eps = _fresh()
        t0 = time.perf_counter()
        out = fn(*args, eps)
        _sync_val(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best * 1e3:8.3f} ms", flush=True)
    return best


K_LO, K_HI = 16, 112


def chain(passfn, k):
    """k data-dependent applications of passfn inside ONE program."""

    def run(a, b, eps):
        return lax.fori_loop(
            0, k, lambda i, ab: tuple(passfn(*ab)), (a + eps, b)
        )

    return jax.jit(run)


def slope(passfn, args2, name):
    tl = timeit_once(chain(passfn, K_LO), args2, label=f"{name} x{K_LO}")
    th = timeit_once(chain(passfn, K_HI), args2, label=f"{name} x{K_HI}")
    per = (th - tl) / (K_HI - K_LO) * 1e3
    print(f"  -> {name}: per-pass {per:.3f} ms", flush=True)
    return per


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from msm_tpu.ops import mxu_fft

    shape = (size, size, size)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    xi = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    print(f"grid {size}^3, precision={mxu_fft._PRECISION}", flush=True)

    # dispatch + fetch floor: trivial scalar op
    timeit_once(
        jax.jit(lambda a, b, eps: (jnp.sum(a[0, 0]) + eps, b)),
        (xr, xi),
        label="dispatch floor (tiny op)",
    )

    # Pure-copy Pallas pass: the DMA floor for one read+write of the planes.
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
    for name, passfn in (
        ("copy pass", copy_pass),
        ("xla elementwise", ew),
        ("fused2", f2),
        ("sublane", sub),
    ):
        slope(passfn, (xr, xi), name)

    # the same transform passes with the bf16x3 3-pass matmuls
    saved = mxu_fft._PRECISION
    mxu_fft._PRECISION = "bf16x3"
    try:
        slope(f2, (xr, xi), "fused2 [bf16x3]")
        slope(sub, (xr, xi), "sublane [bf16x3]")
    finally:
        mxu_fft._PRECISION = saved

    # Poisson roundtrip pass (pmap threaded as a jit argument)
    spec_c = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    def chain_rt(k):
        def run(a, b, s, eps):
            return lax.fori_loop(
                0,
                k,
                lambda i, ab: tuple(
                    mxu_fft._axis_pass_sublane_roundtrip_pmap(*ab, 0, s)
                ),
                (a + eps, b),
            )

        return jax.jit(run)

    tl = timeit_once(chain_rt(K_LO), (xr, xi, spec_c), label=f"poisson roundtrip x{K_LO}")
    th = timeit_once(chain_rt(K_HI), (xr, xi, spec_c), label=f"poisson roundtrip x{K_HI}")
    print(
        f"  -> poisson roundtrip: per-pass {(th - tl) / (K_HI - K_LO) * 1e3:.3f} ms",
        flush=True,
    )

    # XLA reductions as they appear in the step (alias + norm share one
    # read; phi_max folds into the same sweep here). The carry feeds the
    # next iteration's read so the loop body cannot be hoisted.
    def chain_red(k):
        def run(a, b, eps):
            def body(i, acc):
                ash = a + acc[0]
                return (jnp.sum(ash * ash + b * b) + eps, jnp.max(jnp.abs(ash)))

            return lax.fori_loop(0, k, body, (eps, jnp.float32(0)))

        return jax.jit(run)

    tl = timeit_once(chain_red(K_LO), (xr, xi), label=f"fused reductions x{K_LO}")
    th = timeit_once(chain_red(K_HI), (xr, xi), label=f"fused reductions x{K_HI}")
    print(
        f"  -> reductions: per-pass {(th - tl) / (K_HI - K_LO) * 1e3:.3f} ms",
        flush=True,
    )

    # chained full roundtrips: true 3-D F + F^-1 cost
    def rt_pass(a, b):
        z = mxu_fft.inverse_engine(
            mxu_fft.forward_engine(jax.lax.complex(a, b), 3), 3
        )
        return jnp.real(z), jnp.imag(z)

    slope(rt_pass, (xr, xi), "mxu 3-D roundtrip")

    def xla_rt_pass(a, b):
        z = jnp.fft.ifftn(
            jnp.fft.fftn(jax.lax.complex(a, b), axes=(-3, -2, -1)),
            axes=(-3, -2, -1),
        )
        return jnp.real(z), jnp.imag(z)

    slope(xla_rt_pass, (xr, xi), "xla 3-D roundtrip")


if __name__ == "__main__":
    main()
