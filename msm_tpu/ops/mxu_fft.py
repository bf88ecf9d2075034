"""MXU-native FFT: per-axis Cooley-Tukey as Pallas matmul kernels.

Functional counterpart of the reference's FFT layer
(`simulator/src/utils/fft.rs:6-98`), engineered for the TPU's actual
hardware: there is no FFT unit, but there is a 128x128 systolic MXU. Every
transform axis is factored N = R * 128 (R in {1, 2, 4, 8}) and computed as

    radix-R butterfly across the R chunks        (VPU adds, trivial twiddles)
    -> per-residue 128-point DFT matmul           (MXU; twiddles absorbed
       with the CT twiddle folded into the matrix  into the matrix constants)

so each axis pass is ONE read + ONE write of the grid (the HBM-traffic
optimum) and all the arithmetic runs on the MXU. Two kernel geometries
cover every axis with zero transposes:

  - lane kernel:    transform along the LAST axis (contraction in lanes)
  - sublane kernel: transform along any other axis, viewed as (B, N, L)
                    with 128-lane column blocks (contraction in sublanes)

Complex data moves through the kernels as separate real/imag f32 planes
(TPU Pallas has no complex dtype); c64 <-> planar conversion happens once
per transform at the XLA level.

**k-space layout ("engine order")**: outputs are stored residue-major —
stored index p = r*128 + c holds natural frequency k = R*c + r — and the
inverse consumes the same order. This is the classic decimation-without-
reordering trick: the stepper's k-space work (kinetic phases, Poisson
multiply, alias mask) is elementwise, so its k^2 constants are simply
permuted once at trace time (`permute_spec`) and no data shuffle ever
happens on-device. `forward`/`inverse` wrap the engine transforms with the
natural-order permutation for API/test parity with `jnp.fft`.

Round-1 lesson this replaces: a Stockham ladder with in-VMEM sublane
interleaves ran 2.8x slower than XLA and stalled Mosaic on the transpose
kernel (`docs/DESIGN.md` §8); this design has no shuffle at all.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAF = 128  # MXU tile width: the DFT leaf size and lane block width
_MAX_RADIX = 8

# Row block for the lane kernel (rows x N f32 per plane per buffer).
_LANE_ROWS = 256

# Lane-block width for the sublane kernel (multiple of LEAF). Wider blocks
# give the MXU a larger free dimension per matmul instruction and cut the
# grid's block count (fewer pipeline stalls) at the cost of VMEM. Measured
# on v5e at 256^3: 256-512 is flat-optimal, 128 costs ~6%, >=1024 regresses
# (single passes; MSM_SUBLANE_LANES overrides for tuning probes).
_SUBLANE_LANES = int(__import__("os").environ.get("MSM_SUBLANE_LANES", "512"))
if _SUBLANE_LANES <= 0 or _SUBLANE_LANES % LEAF:
    # a non-multiple would make _sublane_view's width search loop forever
    raise ValueError(
        f"MSM_SUBLANE_LANES must be a positive multiple of {LEAF}; "
        f"got {_SUBLANE_LANES}"
    )

# MXU precision for the DFT matmuls. HIGHEST = 6-pass bf16 decomposition
# (exact f32). 'bf16x3' is a hand-rolled 3-pass split (Mosaic does not
# lower Precision.HIGH): each f32 operand splits into hi+lo bfloat16 and
# the dot is wh@xh + wh@xl + wl@xh — 2x the MXU throughput of HIGHEST for
# a ~2^-17 relative floor (vs f32's 2^-24); dropped term lo*lo ~ 2^-18.
#
# The DEFAULT is 'mixed': psi-carrying transforms at HIGHEST (they set the
# unitarity/norm budget), the Poisson chain (rho forward, -coeff/k^2
# roundtrip, phi inverse) at bf16x3. This is exactly as accurate where it
# matters: phi only ever enters as the phase exp(i*v*phi), which is
# UNITARY for any real phi, so a ~1e-5 relative phi error cannot touch
# norm conservation — it is a ~1e-5 relative force perturbation, far
# below the O(dt^2) splitting error (and rho is |psi|^2 of an f32 field
# to begin with). Measured: same 1.1e-4 unitarity drift as all-HIGHEST
# over 200 steps of the 128^3 tophat.
# MSM_MXU_PRECISION=mixed|bf16x3|high|highest overrides at import time.
_PRECISION = {
    "mixed": "mixed",
    "bf16x3": "bf16x3",
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[__import__("os").environ.get("MSM_MXU_PRECISION", "mixed")]

# Fuse the last TWO axes into one kernel pass ((1, N, N) blocks with a VMEM
# scratch intermediate): a 3-D transform becomes 2 HBM passes instead of 3
# and a 2-D transform becomes 1. At HIGHEST precision the passes are
# MXU-bound (docs/DESIGN.md §8d), but fewer passes still win: each pass
# saves ~16 B/cell of HBM traffic and a kernel launch.
_FUSE2 = True

_VMEM_LIMIT = 100 * 1024 * 1024

def _cparams(grid_ndim: int):
    """Every kernel grid axis here is embarrassingly parallel (blocks are
    independent); telling Mosaic so lets it pipeline block DMA with
    compute across grid iterations."""
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("parallel",) * grid_ndim,
    )



def supported(size: int) -> bool:
    return size % LEAF == 0 and size // LEAF in (1, 2, 4, 8)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Permutations and matrix constants (host-side numpy, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def engine_perm(size: int) -> np.ndarray:
    """perm with natural_k[p] = engine_perm(size)[p] for stored index p:
    p = r*LEAF + c  <->  k = R*c + r."""
    r = np.arange(size) // LEAF
    c = np.arange(size) % LEAF
    return (size // LEAF) * c + r


@functools.lru_cache(maxsize=None)
def inverse_perm(size: int) -> np.ndarray:
    """inv with inv[natural_k] = stored index p."""
    p = engine_perm(size)
    inv = np.empty_like(p)
    inv[p] = np.arange(size)
    return inv


def permute_spec(arr: np.ndarray, dims: int) -> np.ndarray:
    """Re-index a k-space constant grid from natural to engine order along
    the last `dims` axes: out[p0, p1, ...] = arr[perm[p0], perm[p1], ...]."""
    out = np.asarray(arr)
    for ax in range(out.ndim - dims, out.ndim):
        perm = engine_perm(out.shape[ax])
        out = np.take(out, perm, axis=ax)
    return out


def to_natural(xk: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Engine-order k-space -> natural fftn order (gather per axis)."""
    for ax in range(xk.ndim - dims, xk.ndim):
        xk = jnp.take(xk, jnp.asarray(inverse_perm(xk.shape[ax])), axis=ax)
    return xk


def to_engine(xk: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Natural fftn order -> engine order."""
    for ax in range(xk.ndim - dims, xk.ndim):
        xk = jnp.take(xk, jnp.asarray(engine_perm(xk.shape[ax])), axis=ax)
    return xk


@functools.lru_cache(maxsize=None)
def _matrices(size: int, inverse: bool, rdtype_name: str) -> np.ndarray:
    """Stacked DFT-leaf matrices, shape (R, 2, LEAF, LEAF) f32/f64.

    Forward, residue r: W_r[b, c] = e^{-2pi i r b / N} e^{-2pi i b c / LEAF}
    / sqrt(LEAF) — the CT twiddle is absorbed into the matrix. Inverse:
    IW_r[c, b] = e^{+2pi i b c / LEAF} / sqrt(LEAF) * e^{+2pi i r b / N}.
    Index [r, 0] is the real part, [r, 1] the imaginary part.
    """
    R = size // LEAF
    b = np.arange(LEAF)
    c = np.arange(LEAF)
    sign = 2.0j if inverse else -2.0j
    leaf = np.exp(sign * np.pi * np.outer(b, c) / LEAF) / math.sqrt(LEAF)
    out = np.empty((R, 2, LEAF, LEAF), dtype=rdtype_name)
    for r in range(R):
        tw = np.exp(sign * np.pi * r * b / size)
        w = (tw[:, None] * leaf) if not inverse else (leaf * tw[:, None]).T
        # inverse: IW_r[c, b] = leaf[b, c] * tw[b] -> transpose of (tw*leaf)
        out[r, 0] = w.real
        out[r, 1] = w.imag
    return out


def _radix_phases(R: int, inverse: bool) -> list[list[complex]]:
    """omega_R^{a r} table (forward: e^{-2pi i a r / R}) as python complex
    constants — folded into the traced adds, never materialized on device.

    Components are snapped to exact 0/±1 (np.exp leaves ~1.2e-16 residue
    on the axis values): the kernels' trace-time fast paths key on exact
    equality — `_real_fwd_lane_stage`'s all-real rows (2 real dots instead
    of a 3-dot Karatsuba) and `_scale_add`'s 0/±1 folding — so an un-
    snapped -1-1.22e-16j silently disables them for every radix-2 row."""
    sign = 2.0j if inverse else -2.0j

    def snap(v: float) -> float:
        for exact in (0.0, 1.0, -1.0):
            if abs(v - exact) < 1e-12:
                return exact
        return v

    return [
        [
            complex(snap(p.real), snap(p.imag))
            for p in (np.exp(sign * np.pi * a * r / R) for a in range(R))
        ]
        for r in range(R)
    ]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _split_bf16(x):
    """Leading-bits split x ~= hi + lo into two bfloat16 terms."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dims, out_dtype):
    """3-pass bf16 split dot: ah@bh + ah@bl + al@bh, f32 accumulation.
    Drops the lo@lo term (~2^-18 relative) — half the MXU passes of
    Precision.HIGHEST for a ~2^-17 floor."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=out_dtype,
    )
    return d(ah, bh) + d(ah, bl) + d(al, bh)


# Complex matmuls as 3 real MXU dots (Karatsuba: re = t1 - t2,
# im = (ar+ai)@(br+bi) - t1 - t2) instead of the schoolbook 4 — a 25% MXU
# saving at every precision, where the fused step is MXU-bound (§8d). The
# VPU operand adds are O(blocksize), negligible vs the O(128*blocksize)
# MACs. Error grows by a small constant (the t3 cancellation), bounded by
# the same eps * (|a_re|+|a_im|)(|b_re|+|b_im|) envelope; validated in
# tests against numpy. MSM_MXU_KARATSUBA=0 restores the 4-dot form.
_KARATSUBA = __import__("os").environ.get("MSM_MXU_KARATSUBA", "1") != "0"


def _dot_fn(precision, dims, dtype):
    # The bf16 split only makes sense for f32 operands; f64 (the CPU/x64
    # test path) always gets an exact dot.
    if precision == "bf16x3" and jnp.dtype(dtype) == jnp.float32:
        return functools.partial(_dot3, dims=dims, out_dtype=dtype)
    if precision == "bf16x3":
        precision = jax.lax.Precision.HIGHEST
    return functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=dtype,
        precision=precision,
    )


def _cmatmul(ar, ai, br, bi, precision):
    """(ar + i ai) @ (br + i bi) as 3 (Karatsuba) or 4 real MXU matmuls."""
    dot = _dot_fn(precision, (((1,), (0,)), ((), ())), ar.dtype)
    if _KARATSUBA:
        t1 = dot(ar, br)
        t2 = dot(ai, bi)
        return t1 - t2, dot(ar + ai, br + bi) - t1 - t2
    return (
        dot(ar, br) - dot(ai, bi),
        dot(ar, bi) + dot(ai, br),
    )


def _cmatmul_t(wr, wi, br, bi, precision):
    """(wr + i wi)^T @ (br + i bi) via dim-0 contraction (no transpose op):
    out[k, l] = sum_b w[b, k] x[b, l]."""
    dot = _dot_fn(precision, (((0,), (0,)), ((), ())), wr.dtype)
    if _KARATSUBA:
        t1 = dot(wr, br)
        t2 = dot(wi, bi)
        return t1 - t2, dot(wr + wi, br + bi) - t1 - t2
    return (
        dot(wr, br) - dot(wi, bi),
        dot(wr, bi) + dot(wi, br),
    )


def _butterfly(chunks, phases, inv_sqrt_r):
    """Radix-R combine: S_r = (1/sqrt R) sum_a omega^{ar} x_a on planar
    (re, im) chunk pairs. Phases are python constants; multiplies by 0/±1
    fold away at trace time."""
    out = []
    for row in phases:
        sre = None
        sim = None
        for (xr, xi), w in zip(chunks, row):
            wr, wi = w.real, w.imag
            tre = _scale_add(xr, wr, xi, -wi)
            tim = _scale_add(xi, wr, xr, wi)
            sre = tre if sre is None else sre + tre
            sim = tim if sim is None else sim + tim
        out.append((sre * inv_sqrt_r, sim * inv_sqrt_r))
    return out


def _scale_add(a, ca, b, cb):
    """ca*a + cb*b with python-constant coefficients, folding 0/±1."""
    if ca == 0.0:
        term1 = None
    elif ca == 1.0:
        term1 = a
    elif ca == -1.0:
        term1 = -a
    else:
        term1 = ca * a
    if cb == 0.0:
        term2 = None
    elif cb == 1.0:
        term2 = b
    elif cb == -1.0:
        term2 = -b
    else:
        term2 = cb * b
    if term1 is None and term2 is None:
        return jnp.zeros_like(a)
    if term1 is None:
        return term2
    if term2 is None:
        return term1
    return term1 + term2


def _lane_kernel(xr_ref, xi_ref, w_ref, or_ref, oi_ref, *, R, inverse, precision):
    """Transform along the LAST axis; block (rows, N) per plane."""
    phases = _radix_phases(R, inverse)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    if not inverse:
        chunks = [
            (xr_ref[:, a * LEAF : (a + 1) * LEAF], xi_ref[:, a * LEAF : (a + 1) * LEAF])
            for a in range(R)
        ]
        s = _butterfly(chunks, phases, inv_sqrt_r)
        for r in range(R):
            yre, yim = _cmatmul(
                s[r][0], s[r][1], w_ref[r, 0], w_ref[r, 1], precision
            )
            or_ref[:, r * LEAF : (r + 1) * LEAF] = yre
            oi_ref[:, r * LEAF : (r + 1) * LEAF] = yim
    else:
        # matmuls first (per stored residue block), butterfly after
        u = []
        for r in range(R):
            xre = xr_ref[:, r * LEAF : (r + 1) * LEAF]
            xim = xi_ref[:, r * LEAF : (r + 1) * LEAF]
            u.append(_cmatmul(xre, xim, w_ref[r, 0], w_ref[r, 1], precision))
        # x_a = (1/sqrt R) sum_r omega^{-ar} U_r ; phases[a][r] = e^{+2pi i a r/R}
        combined = _butterfly(u, phases, inv_sqrt_r)
        for a in range(R):
            or_ref[:, a * LEAF : (a + 1) * LEAF] = combined[a][0]
            oi_ref[:, a * LEAF : (a + 1) * LEAF] = combined[a][1]



def _real_fwd_lane_stage(chunks, phases, inv_sqrt_r, w_ref, precision):
    """Lane-stage DFT of REAL chunks: yields (r, yre, yim). When row r's
    radix phases are all real (always true for R <= 2), the imaginary
    butterfly accumulation is identically zero and the complex leaf
    matmul collapses to 2 real dots instead of 3 (Karatsuba) / 4."""
    R = len(chunks)
    dims = (((1,), (0,)), ((), ()))
    for r in range(R):
        row = phases[r]
        all_real = all(abs(w.imag) < 1e-30 for w in row)
        sre = None
        sim = None
        for a, x in enumerate(chunks):
            w = row[a]
            tre = _scale_add(x, w.real, x, 0.0)
            sre = tre if sre is None else sre + tre
            if not all_real:
                tim = _scale_add(x, w.imag, x, 0.0)
                sim = tim if sim is None else sim + tim
        sre = sre * inv_sqrt_r
        if all_real:
            dot = _dot_fn(precision, dims, sre.dtype)
            yield r, dot(sre, w_ref[r, 0]), dot(sre, w_ref[r, 1])
        else:
            sim = sim * inv_sqrt_r
            yre, yim = _cmatmul(sre, sim, w_ref[r, 0], w_ref[r, 1], precision)
            yield r, yre, yim


def _lane_kernel_real_fwd(xr_ref, w_ref, or_ref, oi_ref, *, R, precision):
    """Forward lane pass for REAL input (imag plane identically zero):
    half the butterfly adds and half the matmuls (the Poisson density)."""
    phases = _radix_phases(R, inverse=False)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    chunks = [xr_ref[:, a * LEAF : (a + 1) * LEAF] for a in range(R)]
    for r, yre, yim in _real_fwd_lane_stage(
        chunks, phases, inv_sqrt_r, w_ref, precision
    ):
        or_ref[:, r * LEAF : (r + 1) * LEAF] = yre
        oi_ref[:, r * LEAF : (r + 1) * LEAF] = yim


def _lane_kernel_real_inv(xr_ref, xi_ref, w_ref, or_ref, *, R, precision):
    """Inverse lane pass emitting only the REAL part (the Poisson
    potential: phi = Re F^-1[phi_k]): half the matmuls and adds."""
    phases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    u = []
    for r in range(R):
        xre = xr_ref[:, r * LEAF : (r + 1) * LEAF]
        xim = xi_ref[:, r * LEAF : (r + 1) * LEAF]
        # Re(U_r) = Xre @ Wre - Xim @ Wim
        u.append(_cmatmul(xre, xim, w_ref[r, 0], w_ref[r, 1], precision))
    for a in range(R):
        acc = None
        for r in range(R):
            w = phases[a][r]
            t = _scale_add(u[r][0], w.real, u[r][1], -w.imag)
            acc = t if acc is None else acc + t
        or_ref[:, a * LEAF : (a + 1) * LEAF] = acc * inv_sqrt_r


def _sublane_kernel(xr_ref, xi_ref, w_ref, or_ref, oi_ref, *, R, inverse, precision):
    """Transform along the middle axis of a (1, N, LANES) block."""
    phases = _radix_phases(R, inverse)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    if not inverse:
        chunks = [
            (xr_ref[0, a * LEAF : (a + 1) * LEAF, :], xi_ref[0, a * LEAF : (a + 1) * LEAF, :])
            for a in range(R)
        ]
        s = _butterfly(chunks, phases, inv_sqrt_r)
        for r in range(R):
            # Y_r = W_r^T @ S_r : contract sublanes of S with rows of W
            yre, yim = _cmatmul_t(
                w_ref[r, 0], w_ref[r, 1], s[r][0], s[r][1], precision
            )
            or_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
            oi_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim
    else:
        u = []
        for r in range(R):
            xre = xr_ref[0, r * LEAF : (r + 1) * LEAF, :]
            xim = xi_ref[0, r * LEAF : (r + 1) * LEAF, :]
            # U_r = IW_r^T @ X_r
            u.append(
                _cmatmul_t(w_ref[r, 0], w_ref[r, 1], xre, xim, precision)
            )
        combined = _butterfly(u, phases, inv_sqrt_r)
        for a in range(R):
            or_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
            oi_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][1]


# ---------------------------------------------------------------------------
# Kernels with fused step elementwise ops (the hot-loop interludes between
# transforms: kinetic/potential phase rotations, Poisson multiply, density).
# Fusing them here removes whole HBM passes — the step is DMA-bound (the
# pure-copy floor is ~0.65 ms/pass at 256^3 on v5e).
# ---------------------------------------------------------------------------


def _sublane_kernel_inv_kphase_sep(
    xr_ref, xi_ref, w_ref, f0c_ref, f0s_ref, f12c_ref, f12s_ref,
    or_ref, oi_ref, *, R, precision,
):
    """Inverse sublane pass with the kinetic phase built from SEPARABLE
    1-D factor tables: exp(i*c*k^2) = exp(i*c*s0[p0]) * exp(i*c*s12[j])
    (k^2 = k0^2 + (k1^2+k2^2) is additive), so the phase costs 4 VPU
    multiplies per element instead of a full-grid spec read + sin/cos
    (update :504-516). f0 is (size, 1) per batch, f12 is (1, lanes)."""
    phases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    c12 = f12c_ref[0]
    s12 = f12s_ref[0]
    u = []
    for r in range(R):
        sl = slice(r * LEAF, (r + 1) * LEAF)
        c0 = f0c_ref[0, sl, :]
        s0 = f0s_ref[0, sl, :]
        pr = c0 * c12 - s0 * s12
        pi = c0 * s12 + s0 * c12
        xre = xr_ref[0, sl, :]
        xim = xi_ref[0, sl, :]
        rre = xre * pr - xim * pi
        rim = xim * pr + xre * pi
        u.append(_cmatmul_t(w_ref[r, 0], w_ref[r, 1], rre, rim, precision))
    combined = _butterfly(u, phases, inv_sqrt_r)
    for a in range(R):
        or_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        oi_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][1]


def _sublane_kernel_roundtrip_poisson_sep(
    xr_ref, xi_ref, wf_ref, wi_ref, s0_ref, s12_ref, or_ref, oi_ref,
    *, R, coeff, precision,
):
    """`_sublane_kernel_roundtrip_pmap` with the Poisson map synthesized
    in-register from the separable k^2 tables: -coeff / (s0[p0] + s12[j])
    with the k=0 mode zeroed (calculate_potential :1076-1102) — no
    full-grid map read. coeff is a python-float constant."""
    fphases = _radix_phases(R, inverse=False)
    iphases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    s12 = s12_ref[...]
    chunks = [
        (xr_ref[0, a * LEAF : (a + 1) * LEAF, :], xi_ref[0, a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, fphases, inv_sqrt_r)
    u = []
    for r in range(R):
        yre, yim = _cmatmul_t(wf_ref[r, 0], wf_ref[r, 1], s[r][0], s[r][1], precision)
        k2 = s0_ref[r * LEAF : (r + 1) * LEAF, :] + s12
        m = jnp.where(k2 > 0.0, -coeff / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
        u.append(_cmatmul_t(wi_ref[r, 0], wi_ref[r, 1], yre * m, yim * m, precision))
    combined = _butterfly(u, iphases, inv_sqrt_r)
    for a in range(R):
        or_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        oi_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][1]


def _sublane_kernel_fwd_reduce_sep(
    xr_ref, xi_ref, w_ref, s0_ref, s12_ref, or_ref, oi_ref, ns_ref, as_ref,
    *, R, cutoff, precision,
):
    """Forward sublane pass with fused norm/alias partial-sum outputs
    and the alias mask synthesized
    in-register from the separable k^2 tables: mask = (s0[p0] + s12[j]) >
    cutoff (check_alias :1249-1293) — no full-grid mask read. cutoff is a
    python-float constant (k2_cutoff * k2_max)."""
    phases = _radix_phases(R, inverse=False)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    s12 = s12_ref[...]
    chunks = [
        (xr_ref[0, a * LEAF : (a + 1) * LEAF, :], xi_ref[0, a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, phases, inv_sqrt_r)
    nsum = None
    asum = None
    for r in range(R):
        yre, yim = _cmatmul_t(w_ref[r, 0], w_ref[r, 1], s[r][0], s[r][1], precision)
        or_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
        oi_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim
        p2 = yre * yre + yim * yim
        k2 = s0_ref[r * LEAF : (r + 1) * LEAF, :] + s12
        ns = jnp.sum(p2)
        am = jnp.sum(jnp.where(k2 > cutoff, p2, 0.0))
        nsum = ns if nsum is None else nsum + ns
        asum = am if asum is None else asum + am
    ns_ref[...] = jnp.broadcast_to(nsum, ns_ref.shape).astype(ns_ref.dtype)
    as_ref[...] = jnp.broadcast_to(asum, as_ref.shape).astype(as_ref.dtype)


def _sublane_kernel_roundtrip_kick_reduce_sep(
    xr_ref, xi_ref, wf_ref, wi_ref, s0_ref, s12_ref,
    f0c_ref, f0s_ref, f12c_ref, f12s_ref,
    *out_refs, R, cutoff, precision, with_reduce,
):
    """Cross-STEP fusion kernel: forward transform of axis 0, optional
    norm/alias partial sums of the full spectrum, kinetic-kick phase
    multiply and inverse transform — all in ONE HBM pass.

    The closing axis-0 forward of step i (update :552) and the opening
    kinetic half-kick + axis-0 inverse of step i+1 (:504-523) are adjacent
    through elementwise k-space work only, so the steady-state evolve loop
    never materializes psik in HBM (stepper's skewed loop /
    `fused_step_3d_skewed`). The reductions (check_norm grid.rs:35-64,
    check_alias :1249-1293) and the kick phase both see the full k^2 =
    s0[p0] + s12[j] synthesized from the separable tables; |psik| is
    invariant under the kick so reduce-then-kick ordering is exact.
    with_reduce=False drops the partial-sum outputs (the exact-dt prefix
    only needs the pending-kicked field)."""
    if with_reduce:
        or_ref, oi_ref, ns_ref, as_ref = out_refs
    else:
        or_ref, oi_ref = out_refs
    fphases = _radix_phases(R, inverse=False)
    iphases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    s12 = s12_ref[...]
    c12 = f12c_ref[0]
    sn12 = f12s_ref[0]
    chunks = [
        (xr_ref[0, a * LEAF : (a + 1) * LEAF, :], xi_ref[0, a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, fphases, inv_sqrt_r)
    nsum = None
    asum = None
    u = []
    for r in range(R):
        yre, yim = _cmatmul_t(wf_ref[r, 0], wf_ref[r, 1], s[r][0], s[r][1], precision)
        sl = slice(r * LEAF, (r + 1) * LEAF)
        if with_reduce:
            p2 = yre * yre + yim * yim
            k2 = s0_ref[sl, :] + s12
            ns = jnp.sum(p2)
            am = jnp.sum(jnp.where(k2 > cutoff, p2, 0.0))
            nsum = ns if nsum is None else nsum + ns
            asum = am if asum is None else asum + am
        c0 = f0c_ref[0, sl, :]
        s0v = f0s_ref[0, sl, :]
        pr = c0 * c12 - s0v * sn12
        pi = c0 * sn12 + s0v * c12
        rre = yre * pr - yim * pi
        rim = yim * pr + yre * pi
        u.append(_cmatmul_t(wi_ref[r, 0], wi_ref[r, 1], rre, rim, precision))
    combined = _butterfly(u, iphases, inv_sqrt_r)
    for a in range(R):
        or_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        oi_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][1]
    if with_reduce:
        ns_ref[...] = jnp.broadcast_to(nsum, ns_ref.shape).astype(ns_ref.dtype)
        as_ref[...] = jnp.broadcast_to(asum, as_ref.shape).astype(as_ref.dtype)


def _inv_density_ladder(
    xr_ref, xi_ref, wi_ref, wf_ref, dr_ref, di_ref, sr_ref, si_ref,
    *, R, prefactor, precision, pprecision, psi_out,
):
    """Shared body of the inv+density kernels: complex fused2 inverse
    (sublane stage -> scratch, lane stage in-register), density
    rho = prefactor*|psi|^2 synthesized from the in-register psi chunks,
    then the real-forward of rho over the same two axes. psi_out =
    (pr_ref, pi_ref) additionally materializes the inverse's field;
    None keeps psi entirely in-register (the exact-dt prefix)."""
    iphases = _radix_phases(R, inverse=True)
    fphases = _radix_phases(R, inverse=False)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    u = [
        _cmatmul_t(
            wi_ref[r, 0],
            wi_ref[r, 1],
            xr_ref[0, r * LEAF : (r + 1) * LEAF, :],
            xi_ref[0, r * LEAF : (r + 1) * LEAF, :],
            precision,
        )
        for r in range(R)
    ]
    combined = _butterfly(u, iphases, inv_sqrt_r)
    for a in range(R):
        sr_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        si_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][1]
    u = [
        _cmatmul(
            sr_ref[:, r * LEAF : (r + 1) * LEAF],
            si_ref[:, r * LEAF : (r + 1) * LEAF],
            wi_ref[r, 0],
            wi_ref[r, 1],
            precision,
        )
        for r in range(R)
    ]
    combined = _butterfly(u, iphases, inv_sqrt_r)
    rho_chunks = []
    for a in range(R):
        pre, pim = combined[a]
        if psi_out is not None:
            psi_out[0][0, :, a * LEAF : (a + 1) * LEAF] = pre
            psi_out[1][0, :, a * LEAF : (a + 1) * LEAF] = pim
        rho_chunks.append(prefactor * (pre * pre + pim * pim))
    # real-forward of rho over the same two axes: lane stage (real input,
    # half the arithmetic) -> scratch, sublane stage -> out
    for r, yre, yim in _real_fwd_lane_stage(
        rho_chunks, fphases, inv_sqrt_r, wf_ref, pprecision
    ):
        sr_ref[:, r * LEAF : (r + 1) * LEAF] = yre
        si_ref[:, r * LEAF : (r + 1) * LEAF] = yim
    chunks = [
        (sr_ref[a * LEAF : (a + 1) * LEAF, :], si_ref[a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, fphases, inv_sqrt_r)
    for r in range(R):
        yre, yim = _cmatmul_t(wf_ref[r, 0], wf_ref[r, 1], s[r][0], s[r][1], pprecision)
        dr_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
        di_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim


def _fused_kernel_inv_density(
    xr_ref, xi_ref, wi_ref, wf_ref, pr_ref, pi_ref, dr_ref, di_ref,
    sr_ref, si_ref, *, R, prefactor, precision, pprecision,
):
    """Fused2 inverse producing psi PLUS the density forward of the same
    plane in one HBM pass: psi is materialized (written out) and
    rho = prefactor*|psi|^2 is synthesized from the in-register psi chunks
    and forward-transformed over the same two axes — one full read of psi
    saved vs the separate density pass (calculate_density :1031-1063)."""
    _inv_density_ladder(
        xr_ref, xi_ref, wi_ref, wf_ref, dr_ref, di_ref, sr_ref, si_ref,
        R=R, prefactor=prefactor, precision=precision,
        pprecision=pprecision, psi_out=(pr_ref, pi_ref),
    )


def _fused_kernel_potkick_fwd(
    coeff_ref, fr_ref, fi_ref, pr_ref, pi_ref, wi_ref, wf_ref,
    or_ref, oi_ref, mx_ref, sr_ref, si_ref, *, R, n0, precision, pprecision,
):
    """Real inverse of phi_k + potential kick + fused2 forward of psi in
    ONE HBM pass: phi = Re F2^-1[phi_k] is computed in-register, psi is
    rotated by exp(i*c*phi) (update :535-545) and forward-transformed over
    the same two axes — phi NEVER exists in HBM. Also emits max|phi| (the
    lagged-dt potential bound, get_timestep :905-915) per block."""
    iphases = _radix_phases(R, inverse=True)
    fphases = _radix_phases(R, inverse=False)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    c = coeff_ref[pl.program_id(0) // n0]
    # real-output fused2 inverse of phi_k: sublane stage -> scratch
    u = [
        _cmatmul_t(
            wi_ref[r, 0],
            wi_ref[r, 1],
            fr_ref[0, r * LEAF : (r + 1) * LEAF, :],
            fi_ref[0, r * LEAF : (r + 1) * LEAF, :],
            pprecision,
        )
        for r in range(R)
    ]
    combined = _butterfly(u, iphases, inv_sqrt_r)
    for a in range(R):
        sr_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        si_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][1]
    u = [
        _cmatmul(
            sr_ref[:, r * LEAF : (r + 1) * LEAF],
            si_ref[:, r * LEAF : (r + 1) * LEAF],
            wi_ref[r, 0],
            wi_ref[r, 1],
            pprecision,
        )
        for r in range(R)
    ]
    # lane inverse keeping only Re -> phi chunks in-register; rotate psi
    mx = None
    rot_chunks = []
    for a in range(R):
        acc = None
        for r in range(R):
            w = iphases[a][r]
            t = _scale_add(u[r][0], w.real, u[r][1], -w.imag)
            acc = t if acc is None else acc + t
        phi_a = acc * inv_sqrt_r
        bm = jnp.max(jnp.abs(phi_a))
        mx = bm if mx is None else jnp.maximum(mx, bm)
        ang = c * phi_a
        cs = jnp.cos(ang)
        sn = jnp.sin(ang)
        sl = slice(a * LEAF, (a + 1) * LEAF)
        xre = pr_ref[0, :, sl]
        xim = pi_ref[0, :, sl]
        rot_chunks.append((xre * cs - xim * sn, xim * cs + xre * sn))
    mx_ref[...] = jnp.broadcast_to(mx, mx_ref.shape).astype(mx_ref.dtype)
    # fused2 forward of the rotated psi: lane stage -> scratch, sublane out
    s = _butterfly(rot_chunks, fphases, inv_sqrt_r)
    for r in range(R):
        yre, yim = _cmatmul(s[r][0], s[r][1], wf_ref[r, 0], wf_ref[r, 1], precision)
        sr_ref[:, r * LEAF : (r + 1) * LEAF] = yre
        si_ref[:, r * LEAF : (r + 1) * LEAF] = yim
    chunks = [
        (sr_ref[a * LEAF : (a + 1) * LEAF, :], si_ref[a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, fphases, inv_sqrt_r)
    for r in range(R):
        yre, yim = _cmatmul_t(wf_ref[r, 0], wf_ref[r, 1], s[r][0], s[r][1], precision)
        or_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
        oi_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim


def _fused_kernel_density_fwd(
    pr_ref, pi_ref, w_ref, or_ref, oi_ref, sr_ref, si_ref, *, R, prefactor, precision
):
    """Fused2 real forward whose input is the density synthesized from the
    psi planes in-register: rho = prefactor * |psi|^2 (calculate_density
    :1031-1063) — rho never exists in HBM."""
    phases = _radix_phases(R, inverse=False)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    chunks = []
    for a in range(R):
        sl = slice(a * LEAF, (a + 1) * LEAF)
        pr = pr_ref[0, :, sl]
        pi = pi_ref[0, :, sl]
        chunks.append(prefactor * (pr * pr + pi * pi))
    for r, yre, yim in _real_fwd_lane_stage(
        chunks, phases, inv_sqrt_r, w_ref, precision
    ):
        sr_ref[:, r * LEAF : (r + 1) * LEAF] = yre
        si_ref[:, r * LEAF : (r + 1) * LEAF] = yim
    chunks = [
        (sr_ref[a * LEAF : (a + 1) * LEAF, :], si_ref[a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, phases, inv_sqrt_r)
    for r in range(R):
        yre, yim = _cmatmul_t(w_ref[r, 0], w_ref[r, 1], s[r][0], s[r][1], precision)
        or_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
        oi_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim


def _sublane_kernel_roundtrip_pmap(
    xr_ref, xi_ref, wf_ref, wi_ref, pmap_ref, or_ref, oi_ref, *, R, precision
):
    """Forward transform, k-space map multiply, inverse transform of the
    SAME axis in one HBM pass: the Poisson solve's middle axis (rho_k is
    produced, multiplied by -coeff/k^2 and consumed without ever existing
    in HBM; calculate_potential :1066-1110). Valid because the map factor
    for this block is elementwise in the block's own k index."""
    fphases = _radix_phases(R, inverse=False)
    iphases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    chunks = [
        (xr_ref[0, a * LEAF : (a + 1) * LEAF, :], xi_ref[0, a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, fphases, inv_sqrt_r)
    u = []
    for r in range(R):
        yre, yim = _cmatmul_t(wf_ref[r, 0], wf_ref[r, 1], s[r][0], s[r][1], precision)
        m = pmap_ref[0, r * LEAF : (r + 1) * LEAF, :]
        u.append(_cmatmul_t(wi_ref[r, 0], wi_ref[r, 1], yre * m, yim * m, precision))
    combined = _butterfly(u, iphases, inv_sqrt_r)
    for a in range(R):
        or_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        oi_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][1]


def _sublane_kernel_inv_pmap(
    xr_ref, xi_ref, w_ref, pmap_ref, or_ref, oi_ref, *, R, precision
):
    """Inverse sublane pass with a fused real multiply by a k-space map:
    the Poisson -coeff/k^2 (k=0 zeroed) multiply (calculate_potential
    :1076-1102) rides the inverse transform's read of rho_k."""
    phases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    u = []
    for r in range(R):
        sl = slice(r * LEAF, (r + 1) * LEAF)
        m = pmap_ref[0, sl, :]
        u.append(
            _cmatmul_t(
                w_ref[r, 0],
                w_ref[r, 1],
                xr_ref[0, sl, :] * m,
                xi_ref[0, sl, :] * m,
                precision,
            )
        )
    combined = _butterfly(u, phases, inv_sqrt_r)
    for a in range(R):
        or_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        oi_ref[0, a * LEAF : (a + 1) * LEAF, :] = combined[a][1]


def _fused_kernel(
    xr_ref, xi_ref, w_ref, or_ref, oi_ref, sr_ref, si_ref, *, R, inverse, precision
):
    """Transform the last TWO axes of a (1, N, N) block in one HBM pass.

    Stage 1 writes the first axis transform into VMEM scratch (sr/si);
    stage 2 transforms the other axis from scratch into the output block.
    The per-axis math is identical to _lane_kernel/_sublane_kernel, so the
    engine k-order is unchanged.
    """
    phases = _radix_phases(R, inverse)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    if not inverse:
        # lane transform x -> scratch
        chunks = [
            (xr_ref[0, :, a * LEAF : (a + 1) * LEAF], xi_ref[0, :, a * LEAF : (a + 1) * LEAF])
            for a in range(R)
        ]
        s = _butterfly(chunks, phases, inv_sqrt_r)
        for r in range(R):
            yre, yim = _cmatmul(s[r][0], s[r][1], w_ref[r, 0], w_ref[r, 1], precision)
            sr_ref[:, r * LEAF : (r + 1) * LEAF] = yre
            si_ref[:, r * LEAF : (r + 1) * LEAF] = yim
        # sublane transform scratch -> out
        chunks = [
            (sr_ref[a * LEAF : (a + 1) * LEAF, :], si_ref[a * LEAF : (a + 1) * LEAF, :])
            for a in range(R)
        ]
        s = _butterfly(chunks, phases, inv_sqrt_r)
        for r in range(R):
            yre, yim = _cmatmul_t(w_ref[r, 0], w_ref[r, 1], s[r][0], s[r][1], precision)
            or_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
            oi_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim
    else:
        # sublane inverse x -> scratch (matmuls first, butterfly after)
        u = [
            _cmatmul_t(
                w_ref[r, 0],
                w_ref[r, 1],
                xr_ref[0, r * LEAF : (r + 1) * LEAF, :],
                xi_ref[0, r * LEAF : (r + 1) * LEAF, :],
                precision,
            )
            for r in range(R)
        ]
        combined = _butterfly(u, phases, inv_sqrt_r)
        for a in range(R):
            sr_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
            si_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][1]
        # lane inverse scratch -> out
        u = [
            _cmatmul(
                sr_ref[:, r * LEAF : (r + 1) * LEAF],
                si_ref[:, r * LEAF : (r + 1) * LEAF],
                w_ref[r, 0],
                w_ref[r, 1],
                precision,
            )
            for r in range(R)
        ]
        combined = _butterfly(u, phases, inv_sqrt_r)
        for a in range(R):
            or_ref[0, :, a * LEAF : (a + 1) * LEAF] = combined[a][0]
            oi_ref[0, :, a * LEAF : (a + 1) * LEAF] = combined[a][1]


def _fused_kernel_real_fwd(xr_ref, w_ref, or_ref, oi_ref, sr_ref, si_ref, *, R, precision):
    """Fused forward for REAL input: real lane stage (half the arithmetic,
    zero imag plane never read) into scratch, complex sublane stage out."""
    phases = _radix_phases(R, inverse=False)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    chunks = [xr_ref[0, :, a * LEAF : (a + 1) * LEAF] for a in range(R)]
    for r, yre, yim in _real_fwd_lane_stage(
        chunks, phases, inv_sqrt_r, w_ref, precision
    ):
        sr_ref[:, r * LEAF : (r + 1) * LEAF] = yre
        si_ref[:, r * LEAF : (r + 1) * LEAF] = yim
    chunks = [
        (sr_ref[a * LEAF : (a + 1) * LEAF, :], si_ref[a * LEAF : (a + 1) * LEAF, :])
        for a in range(R)
    ]
    s = _butterfly(chunks, phases, inv_sqrt_r)
    for r in range(R):
        yre, yim = _cmatmul_t(w_ref[r, 0], w_ref[r, 1], s[r][0], s[r][1], precision)
        or_ref[0, r * LEAF : (r + 1) * LEAF, :] = yre
        oi_ref[0, r * LEAF : (r + 1) * LEAF, :] = yim


def _real_inv_ladder(xr_ref, xi_ref, w_ref, sr_ref, si_ref, *, R, precision):
    """Shared body of the real-output fused2 inverses: complex sublane
    inverse into scratch, lane-stage products, then yields the real field
    chunk per lane block for the caller's epilogue (write or reduce).
    Re(U_r) and Im(U_r) are both needed by the butterfly's complex phases;
    only the final output drops the imag plane."""
    phases = _radix_phases(R, inverse=True)
    inv_sqrt_r = 1.0 / math.sqrt(R)
    u = [
        _cmatmul_t(
            w_ref[r, 0],
            w_ref[r, 1],
            xr_ref[0, r * LEAF : (r + 1) * LEAF, :],
            xi_ref[0, r * LEAF : (r + 1) * LEAF, :],
            precision,
        )
        for r in range(R)
    ]
    combined = _butterfly(u, phases, inv_sqrt_r)
    for a in range(R):
        sr_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][0]
        si_ref[a * LEAF : (a + 1) * LEAF, :] = combined[a][1]
    u = [
        _cmatmul(
            sr_ref[:, r * LEAF : (r + 1) * LEAF],
            si_ref[:, r * LEAF : (r + 1) * LEAF],
            w_ref[r, 0],
            w_ref[r, 1],
            precision,
        )
        for r in range(R)
    ]
    for a in range(R):
        acc = None
        for r in range(R):
            w = phases[a][r]
            t = _scale_add(u[r][0], w.real, u[r][1], -w.imag)
            acc = t if acc is None else acc + t
        yield a, acc * inv_sqrt_r


def _fused_kernel_real_inv(
    xr_ref, xi_ref, w_ref, or_ref, sr_ref, si_ref, *, R, precision
):
    """Fused inverse emitting only the REAL plane: complex sublane inverse
    into scratch, real-output lane inverse out (half its arithmetic)."""
    for a, field in _real_inv_ladder(
        xr_ref, xi_ref, w_ref, sr_ref, si_ref, R=R, precision=precision
    ):
        or_ref[0, :, a * LEAF : (a + 1) * LEAF] = field


# ---------------------------------------------------------------------------
# Per-axis passes (planar in, planar out)
# ---------------------------------------------------------------------------


def _precision():
    """Precision for psi-carrying transforms (sets the unitarity budget)."""
    if _PRECISION == "mixed":
        return jax.lax.Precision.HIGHEST
    return _PRECISION


def _precision_poisson():
    """Precision for the Poisson chain (rho fwd, roundtrip, phi inverse):
    phi enters only as a unitary phase, so bf16x3 here is free accuracy-
    wise (module docstring at _PRECISION)."""
    if _PRECISION == "mixed":
        return "bf16x3"
    return _PRECISION


def _axis_pass_lane(xr, xi, size: int, inverse: bool):
    """Transform the last axis of (..., size) planar arrays."""
    R = size // LEAF
    w = jnp.asarray(_matrices(size, inverse, xr.dtype.name))
    lead = xr.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    xr2 = xr.reshape(rows, size)
    xi2 = xi.reshape(rows, size)
    rb = min(_LANE_ROWS, rows)
    while rows % rb:
        rb -= 1
    grid = (rows // rb,)
    spec = pl.BlockSpec((rb, size), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _lane_kernel, R=R, inverse=inverse, precision=_precision()
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, wspec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, size), xr.dtype),
            jax.ShapeDtypeStruct((rows, size), xr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(xr2, xi2, w)
    return out[0].reshape(lead + (size,)), out[1].reshape(lead + (size,))


def _axis_pass_lane_real(xr_or_pair, size: int, inverse: bool):
    """Real-input forward (xr only in) or real-output inverse ((xr, xi) in,
    xr out) along the last axis."""
    R = size // LEAF
    if inverse:
        xr, xi = xr_or_pair
    else:
        xr, xi = xr_or_pair, None
    w = jnp.asarray(_matrices(size, inverse, xr.dtype.name))
    lead = xr.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    rb = min(_LANE_ROWS, rows)
    while rows % rb:
        rb -= 1
    grid = (rows // rb,)
    spec = pl.BlockSpec((rb, size), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    common = dict(
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )
    if not inverse:
        kern = functools.partial(
            _lane_kernel_real_fwd, R=R, precision=_precision_poisson()
        )
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec, wspec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((rows, size), xr.dtype),
                jax.ShapeDtypeStruct((rows, size), xr.dtype),
            ],
            **common,
        )(xr.reshape(rows, size), w)
        return out[0].reshape(lead + (size,)), out[1].reshape(lead + (size,))
    kern = functools.partial(_lane_kernel_real_inv, R=R, precision=_precision_poisson())
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, wspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, size), xr.dtype),
        **common,
    )(xr.reshape(rows, size), xi.reshape(rows, size), w)
    return out.reshape(lead + (size,))


def _axis_pass_fused2(xr, xi, inverse: bool):
    """Transform the last TWO axes (both of size shape[-1]) in one pass."""
    size = xr.shape[-1]
    assert xr.shape[-2] == size
    R = size // LEAF
    w = jnp.asarray(_matrices(size, inverse, xr.dtype.name))
    lead = xr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    xr3 = xr.reshape(m, size, size)
    xi3 = xi.reshape(m, size, size)
    spec = pl.BlockSpec((1, size, size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _fused_kernel, R=R, inverse=inverse, precision=_precision()
    )
    out = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[spec, spec, wspec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, size, size), xr.dtype),
            jax.ShapeDtypeStruct((m, size, size), xr.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((size, size), xr.dtype),
            pltpu.VMEM((size, size), xr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(xr3, xi3, w)
    shape = lead + (size, size)
    return out[0].reshape(shape), out[1].reshape(shape)


def _sublane_view(xr, axis: int):
    """(b1, size, lanes) view params for a sublane pass over `axis`."""
    axis = axis % xr.ndim
    size = xr.shape[axis]
    lead = xr.shape[:axis]
    trail = xr.shape[axis + 1 :]
    b1 = int(np.prod(lead)) if lead else 1
    lanes = int(np.prod(trail)) if trail else 1
    assert lanes % LEAF == 0, "trailing extent must be a multiple of 128"
    width = min(_SUBLANE_LANES, lanes)
    while lanes % width:
        width -= LEAF
    return size, b1, lanes, width


def _axis_pass_sublane_roundtrip_pmap(xr, xi, axis: int, pmap):
    """One-pass F_axis -> pmap multiply -> F_axis^-1 (see kernel)."""
    size, b1, lanes, width = _sublane_view(xr, axis)
    R = size // LEAF
    wf = jnp.asarray(_matrices(size, False, xr.dtype.name))
    wi = jnp.asarray(_matrices(size, True, xr.dtype.name))
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    pmap3 = jnp.asarray(pmap, xr.dtype).reshape(1, size, lanes)
    grid = (b1, lanes // width)
    spec_x = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    spec_m = pl.BlockSpec(
        (1, size, width), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _sublane_kernel_roundtrip_pmap, R=R, precision=_precision_poisson()
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_x, spec_x, wspec, wspec, spec_m],
        out_specs=[spec_x, spec_x],
        out_shape=[
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
        ],
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, wf, wi, pmap3)
    return out[0].reshape(xr.shape), out[1].reshape(xr.shape)


def _axis_pass_sublane_inv_pmap(xr, xi, axis: int, pmap):
    """Inverse sublane pass fused with a real k-space map multiply (the
    Poisson -coeff/k^2 with k=0 zeroed, in ENGINE order)."""
    size, b1, lanes, width = _sublane_view(xr, axis)
    R = size // LEAF
    w = jnp.asarray(_matrices(size, True, xr.dtype.name))
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    pmap3 = jnp.asarray(pmap, xr.dtype).reshape(1, size, lanes)
    grid = (b1, lanes // width)
    spec_x = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    spec_m = pl.BlockSpec(
        (1, size, width), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(_sublane_kernel_inv_pmap, R=R, precision=_precision_poisson())
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_x, spec_x, wspec, spec_m],
        out_specs=[spec_x, spec_x],
        out_shape=[
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
        ],
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, w, pmap3)
    return out[0].reshape(xr.shape), out[1].reshape(xr.shape)


def _axis_pass_fused2_density(pr, pi, prefactor: float):
    """Fused2 real-forward pass whose input is rho = prefactor*|psi|^2,
    synthesized from the psi planes in-register."""
    size = pr.shape[-1]
    assert pr.shape[-2] == size
    R = size // LEAF
    w = jnp.asarray(_matrices(size, False, pr.dtype.name))
    lead = pr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    spec = pl.BlockSpec((1, size, size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _fused_kernel_density_fwd,
        R=R,
        prefactor=float(prefactor),
        precision=_precision_poisson(),
    )
    out = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[spec, spec, wspec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, size, size), pr.dtype),
            jax.ShapeDtypeStruct((m, size, size), pr.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((size, size), pr.dtype),
            pltpu.VMEM((size, size), pr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(pr.reshape(m, size, size), pi.reshape(m, size, size), w)
    shape = lead + (size, size)
    return out[0].reshape(shape), out[1].reshape(shape)


def _axis_pass_fused2_inv_density(xr, xi, prefactor: float):
    """One-pass fused2 inverse + in-register density forward (see kernel).
    Returns (psi_re, psi_im, rhoT_re, rhoT_im)."""
    size = xr.shape[-1]
    assert xr.shape[-2] == size
    R = size // LEAF
    wi = jnp.asarray(_matrices(size, True, xr.dtype.name))
    wf = jnp.asarray(_matrices(size, False, xr.dtype.name))
    lead = xr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    spec = pl.BlockSpec((1, size, size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _fused_kernel_inv_density,
        R=R,
        prefactor=float(prefactor),
        precision=_precision(),
        pprecision=_precision_poisson(),
    )
    out = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[spec, spec, wspec, wspec],
        out_specs=[spec, spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((m, size, size), xr.dtype)] * 4,
        scratch_shapes=[
            pltpu.VMEM((size, size), xr.dtype),
            pltpu.VMEM((size, size), xr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(xr.reshape(m, size, size), xi.reshape(m, size, size), wi, wf)
    shape = lead + (size, size)
    return tuple(o.reshape(shape) for o in out)


def _axis_pass_fused2_potkick_fwd(fr, fi, pr, pi, coeff):
    """One-pass real inverse of phi_k + exp(i*coeff_b*phi) kick on psi +
    fused2 forward (see kernel). Returns (psikT_re, psikT_im, absmax)
    with absmax one scalar per leading-block (batch*n0) element."""
    size = fr.shape[-1]
    assert fr.shape[-2] == size
    R = size // LEAF
    wi = jnp.asarray(_matrices(size, True, fr.dtype.name))
    wf = jnp.asarray(_matrices(size, False, fr.dtype.name))
    lead = fr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    coeff = jnp.asarray(coeff, fr.dtype).reshape(-1)
    b = coeff.shape[0]
    assert m % b == 0
    n0 = m // b
    spec = pl.BlockSpec(
        (1, size, size), lambda i, *_refs: (i, 0, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, *_refs: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (1, 8, LEAF), lambda i, *_refs: (i, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _fused_kernel_potkick_fwd,
        R=R,
        n0=n0,
        precision=_precision(),
        pprecision=_precision_poisson(),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m,),
            in_specs=[spec, spec, spec, spec, wspec, wspec],
            out_specs=[spec, spec, sspec],
            scratch_shapes=[
                pltpu.VMEM((size, size), fr.dtype),
                pltpu.VMEM((size, size), fr.dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, size, size), fr.dtype),
            jax.ShapeDtypeStruct((m, size, size), fr.dtype),
            jax.ShapeDtypeStruct((m, 8, LEAF), fr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(
        coeff,
        fr.reshape(m, size, size),
        fi.reshape(m, size, size),
        pr.reshape(m, size, size),
        pi.reshape(m, size, size),
        wi,
        wf,
    )
    shape = lead + (size, size)
    return out[0].reshape(shape), out[1].reshape(shape), out[2][:, 0, 0]


def _sep_tables(s0, s12, dtype):
    s0 = jnp.asarray(s0, dtype).reshape(-1, 1)
    s12 = jnp.asarray(s12, dtype).reshape(1, -1)
    return s0, s12


def _axis_pass_sublane_inv_kphase_sep(xr, xi, axis: int, s0, s12, coeff):
    """Inverse sublane pass with the separable exp(i*c*k^2) factor tables
    computed OUTSIDE the kernel (b x size + b x lanes sin/cos — trivial)
    instead of a full-grid spec read + in-kernel transcendentals."""
    size, b1, lanes, width = _sublane_view(xr, axis)
    R = size // LEAF
    w = jnp.asarray(_matrices(size, True, xr.dtype.name))
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    c = jnp.broadcast_to(jnp.asarray(coeff, xr.dtype).reshape(-1), (b1,))
    s0v = jnp.asarray(s0, xr.dtype).reshape(1, size)
    s12v = jnp.asarray(s12, xr.dtype).reshape(1, lanes)
    ang0 = c[:, None] * s0v
    ang12 = c[:, None] * s12v
    f0c = jnp.cos(ang0).reshape(b1, size, 1)
    f0s = jnp.sin(ang0).reshape(b1, size, 1)
    f12c = jnp.cos(ang12).reshape(b1, 1, lanes)
    f12s = jnp.sin(ang12).reshape(b1, 1, lanes)
    grid = (b1, lanes // width)
    spec_x = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    spec_f0 = pl.BlockSpec(
        (1, size, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_f12 = pl.BlockSpec(
        (1, 1, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _sublane_kernel_inv_kphase_sep, R=R, precision=_precision()
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_x, spec_x, wspec, spec_f0, spec_f0, spec_f12, spec_f12],
        out_specs=[spec_x, spec_x],
        out_shape=[
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
        ],
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, w, f0c, f0s, f12c, f12s)
    return out[0].reshape(xr.shape), out[1].reshape(xr.shape)


def _axis_pass_sublane_roundtrip_poisson_sep(xr, xi, axis: int, s0, s12, coeff: float):
    """Roundtrip Poisson pass with -coeff/k^2 synthesized in-register from
    the separable k^2 tables (no full-grid map read)."""
    size, b1, lanes, width = _sublane_view(xr, axis)
    R = size // LEAF
    wf = jnp.asarray(_matrices(size, False, xr.dtype.name))
    wi = jnp.asarray(_matrices(size, True, xr.dtype.name))
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    s0v, s12v = _sep_tables(s0, s12, xr.dtype)
    grid = (b1, lanes // width)
    spec_x = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    spec_s0 = pl.BlockSpec((size, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    spec_s12 = pl.BlockSpec((1, width), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _sublane_kernel_roundtrip_poisson_sep,
        R=R,
        coeff=float(coeff),
        precision=_precision_poisson(),
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_x, spec_x, wspec, wspec, spec_s0, spec_s12],
        out_specs=[spec_x, spec_x],
        out_shape=[
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
        ],
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, wf, wi, s0v, s12v)
    return out[0].reshape(xr.shape), out[1].reshape(xr.shape)


def _axis_pass_sublane_fwd_reduce_sep(xr, xi, axis: int, s0, s12, cutoff: float):
    """Forward sublane pass with fused norm/alias partials and the alias
    mask synthesized in-register from the separable k^2 tables."""
    size, b1, lanes, width = _sublane_view(xr, axis)
    R = size // LEAF
    w = jnp.asarray(_matrices(size, False, xr.dtype.name))
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    s0v, s12v = _sep_tables(s0, s12, xr.dtype)
    nblk = lanes // width
    grid = (b1, nblk)
    spec_x = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    spec_s0 = pl.BlockSpec((size, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    spec_s12 = pl.BlockSpec((1, width), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (1, 1, 8, LEAF), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _sublane_kernel_fwd_reduce_sep,
        R=R,
        cutoff=float(cutoff),
        precision=_precision(),
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_x, spec_x, wspec, spec_s0, spec_s12],
        out_specs=[spec_x, spec_x, sspec, sspec],
        out_shape=[
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, nblk, 8, LEAF), xr.dtype),
            jax.ShapeDtypeStruct((b1, nblk, 8, LEAF), xr.dtype),
        ],
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, w, s0v, s12v)
    return (
        out[0].reshape(xr.shape),
        out[1].reshape(xr.shape),
        out[2][..., 0, 0],
        out[3][..., 0, 0],
    )


def _axis_pass_sublane_roundtrip_kick_reduce_sep(
    xr, xi, axis: int, s0, s12, coeff, cutoff: float, with_reduce: bool = True
):
    """One-pass F_axis -> (norm/alias partial sums; exp(i*c*k^2) kick) ->
    F_axis^-1 (see kernel). coeff is per-stream leading-batch scalars; the
    separable phase-factor tables are built by XLA outside the kernel
    (b x size + b x lanes sin/cos — trivial). Returns (re, im, norm_sums,
    alias_sums) with the partial sums shaped (b1, lanes // width), or just
    (re, im) when with_reduce=False."""
    size, b1, lanes, width = _sublane_view(xr, axis)
    R = size // LEAF
    wf = jnp.asarray(_matrices(size, False, xr.dtype.name))
    wi = jnp.asarray(_matrices(size, True, xr.dtype.name))
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    s0v, s12v = _sep_tables(s0, s12, xr.dtype)
    c = jnp.broadcast_to(jnp.asarray(coeff, xr.dtype).reshape(-1), (b1,))
    ang0 = c[:, None] * jnp.asarray(s0, xr.dtype).reshape(1, size)
    ang12 = c[:, None] * jnp.asarray(s12, xr.dtype).reshape(1, lanes)
    f0c = jnp.cos(ang0).reshape(b1, size, 1)
    f0s = jnp.sin(ang0).reshape(b1, size, 1)
    f12c = jnp.cos(ang12).reshape(b1, 1, lanes)
    f12s = jnp.sin(ang12).reshape(b1, 1, lanes)
    nblk = lanes // width
    grid = (b1, nblk)
    spec_x = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    spec_s0 = pl.BlockSpec((size, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    spec_s12 = pl.BlockSpec((1, width), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    spec_f0 = pl.BlockSpec(
        (1, size, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_f12 = pl.BlockSpec(
        (1, 1, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (1, 1, 8, LEAF), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _sublane_kernel_roundtrip_kick_reduce_sep,
        R=R,
        cutoff=float(cutoff),
        precision=_precision(),
        with_reduce=with_reduce,
    )
    out_specs = [spec_x, spec_x]
    out_shape = [
        jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
        jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
    ]
    if with_reduce:
        out_specs += [sspec, sspec]
        out_shape += [jax.ShapeDtypeStruct((b1, nblk, 8, LEAF), xr.dtype)] * 2
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            spec_x, spec_x, wspec, wspec, spec_s0, spec_s12,
            spec_f0, spec_f0, spec_f12, spec_f12,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, wf, wi, s0v, s12v, f0c, f0s, f12c, f12s)
    if not with_reduce:
        return out[0].reshape(xr.shape), out[1].reshape(xr.shape)
    return (
        out[0].reshape(xr.shape),
        out[1].reshape(xr.shape),
        out[2][..., 0, 0],
        out[3][..., 0, 0],
    )


def fused_step_3d(
    psik, s0, s12, kcoeff, vcoeff,
    poisson_coeff: float, alias_cutoff: float, prefactor: float,
):
    """The full lagged KDK step interior (update :475-661) in FIVE HBM
    passes over a 3-D grid — rho, rho_k, phi_k and phi never exist in
    HBM, and no k-space constant GRID is ever read (the kinetic phase,
    Poisson map and alias mask are all synthesized from the separable
    1-D k^2 tables s0 (axis 0) and s12 (flattened k1^2+k2^2), both in
    ENGINE order):

      1. sublane inverse of axis 0 with the merged kinetic half-kick
         exp(i*kcoeff*k^2) built from per-axis factor tables;
      2. fused2 inverse of (y, z) materializing psi, with the density
         rho = prefactor*|psi|^2 synthesized in-register and forward-
         transformed over the same two axes;
      3. one-kernel axis-0 roundtrip F -> (-poisson_coeff/k^2) -> F^-1
         of rho, the map computed in-register;
      4. real inverse of phi_k over (y, z) in-register, potential kick
         exp(i*vcoeff*phi) on psi, fused2 forward — also emits max|phi|
         (the lagged-dt bound);
      5. sublane forward of axis 0 — also emits sum|psik|^2 (unitarity)
         and sum((k^2 > alias_cutoff)*|psik|^2) (alias mass) per block.

    Returns (psi, psik_new, norm_sums, alias_sums, phi_max) with the
    reductions shaped like the leading batch axes. The closing half-kick
    is NOT applied (the caller defers/merges it; _finalize_step).
    """
    lead = psik.shape[:-3]
    n0 = psik.shape[-3]
    xr = jnp.real(psik)
    xi = jnp.imag(psik)
    ax0 = psik.ndim - 3
    xr, xi = _axis_pass_sublane_inv_kphase_sep(xr, xi, ax0, s0, s12, kcoeff)
    pr, pi, qr, qi, mx = _interior_passes_234(
        xr, xi, ax0, s0, s12, vcoeff, poisson_coeff, prefactor
    )
    qr, qi, ns, am = _axis_pass_sublane_fwd_reduce_sep(
        qr, qi, ax0, s0, s12, alias_cutoff
    )
    phi_max = jnp.max(mx.reshape(lead + (n0,)), axis=-1)
    ns = jnp.sum(ns.reshape(lead + (-1,)), axis=-1)
    am = jnp.sum(am.reshape(lead + (-1,)), axis=-1)
    return (
        jax.lax.complex(pr, pi),
        jax.lax.complex(qr, qi),
        ns,
        am,
        phi_max,
    )


def _interior_passes_234(xr, xi, ax0, s0, s12, vcoeff, poisson_coeff, prefactor):
    """Passes 2-4 of the fused step (see fused_step_3d): input is the
    mixed-space field (axis 0 spatial, axes 1-2 in engine k); returns the
    psi planes, the pass-4 output (same mixed layout) and per-(batch*n0)
    max|phi| partials."""
    pr, pi, dr, di = _axis_pass_fused2_inv_density(xr, xi, prefactor)
    dr, di = _axis_pass_sublane_roundtrip_poisson_sep(
        dr, di, ax0, s0, s12, poisson_coeff
    )
    qr, qi, mx = _axis_pass_fused2_potkick_fwd(dr, di, pr, pi, vcoeff)
    return pr, pi, qr, qi, mx


def fused_step_3d_skewed(
    qr, qi, s0, s12, kcoeff, vcoeff,
    poisson_coeff: float, alias_cutoff: float, prefactor: float,
):
    """The lagged KDK step interior SKEWED by half a pass: input and output
    are the MIXED-space field q (axis 0 spatial, axes 1-2 in engine k — the
    pass-4 output layout) as planar f32, with F_0(q) == the true psik (any
    deferred half-kick folded into kcoeff by the caller).

    Pass A fuses step i's closing axis-0 forward (+ the norm/alias
    reductions of psik AFTER step i) with step i+1's opening kinetic kick
    exp(i*kcoeff*k^2) and axis-0 inverse into ONE kernel
    (`_sublane_kernel_roundtrip_kick_reduce_sep`); passes 2-4 are exactly
    fused_step_3d's. In the steady-state evolve loop psik therefore never
    exists in HBM, and the loop carrier stays planar f32 (no complex64
    join/split passes at the while_loop back edge) — ~48 B/cell/step less
    HBM traffic than the 5-pass form.

    Returns (q_re, q_im, norm_sums, alias_sums, phi_max). NB: the
    reductions describe the INPUT state (one step behind — the caller
    accounts them to the previous step and re-derives the final step's at
    materialization, `skew_exit`).
    """
    lead = qr.shape[:-3]
    n0 = qr.shape[-3]
    ax0 = qr.ndim - 3
    xr, xi, ns, am = _axis_pass_sublane_roundtrip_kick_reduce_sep(
        qr, qi, ax0, s0, s12, kcoeff, alias_cutoff
    )
    _pr, _pi, qr2, qi2, mx = _interior_passes_234(
        xr, xi, ax0, s0, s12, vcoeff, poisson_coeff, prefactor
    )
    phi_max = jnp.max(mx.reshape(lead + (n0,)), axis=-1)
    ns = jnp.sum(ns.reshape(lead + (-1,)), axis=-1)
    am = jnp.sum(am.reshape(lead + (-1,)), axis=-1)
    return qr2, qi2, ns, am, phi_max


def _fused_kernel_inv_density_rho_only(
    xr_ref, xi_ref, wi_ref, wf_ref, dr_ref, di_ref,
    sr_ref, si_ref, *, R, prefactor, precision, pprecision,
):
    """`_fused_kernel_inv_density` minus the psi writes: the inverse's
    output field is consumed in-register by the density synthesis only.
    Used by the exact-dt skew prefix, where psi(t) is needed solely as
    rho = prefactor*|psi|^2 for the adaptive-dt potential (get_timestep
    :878-934) and never has to exist in HBM."""
    _inv_density_ladder(
        xr_ref, xi_ref, wi_ref, wf_ref, dr_ref, di_ref, sr_ref, si_ref,
        R=R, prefactor=prefactor, precision=precision,
        pprecision=pprecision, psi_out=None,
    )


def _axis_pass_fused2_inv_density_rho_only(xr, xi, prefactor: float):
    """One-pass fused2 inverse + in-register density forward, emitting
    ONLY the transformed density (psi never written). Returns
    (rhoT_re, rhoT_im)."""
    size = xr.shape[-1]
    assert xr.shape[-2] == size
    R = size // LEAF
    wi = jnp.asarray(_matrices(size, True, xr.dtype.name))
    wf = jnp.asarray(_matrices(size, False, xr.dtype.name))
    lead = xr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    spec = pl.BlockSpec((1, size, size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _fused_kernel_inv_density_rho_only,
        R=R,
        prefactor=float(prefactor),
        precision=_precision(),
        pprecision=_precision_poisson(),
    )
    out = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[spec, spec, wspec, wspec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((m, size, size), xr.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((size, size), xr.dtype),
            pltpu.VMEM((size, size), xr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(xr.reshape(m, size, size), xi.reshape(m, size, size), wi, wf)
    shape = lead + (size, size)
    return out[0].reshape(shape), out[1].reshape(shape)


def _fused_kernel_real_inv_max(
    xr_ref, xi_ref, w_ref, mx_ref, sr_ref, si_ref, *, R, precision
):
    """`_fused_kernel_real_inv` emitting ONLY max|Re field| partials: the
    exact-dt prefix needs phi(t) solely for the potential CFL bound
    max|phi| (get_timestep :905-909), so phi never touches HBM."""
    mx = None
    for _a, field in _real_inv_ladder(
        xr_ref, xi_ref, w_ref, sr_ref, si_ref, R=R, precision=precision
    ):
        bm = jnp.max(jnp.abs(field))
        mx = bm if mx is None else jnp.maximum(mx, bm)
    mx_ref[...] = jnp.broadcast_to(mx, mx_ref.shape).astype(mx_ref.dtype)


def _axis_pass_fused2_real_inv_max(xr, xi):
    """Fused2 real inverse reduced to per-block max|field| — no grid
    output. Returns maxes shaped like the leading block axes (flattened)."""
    size = xr.shape[-1]
    assert xr.shape[-2] == size
    R = size // LEAF
    w = jnp.asarray(_matrices(size, True, xr.dtype.name))
    lead = xr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    spec = pl.BlockSpec((1, size, size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec((1, 8, LEAF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(
        _fused_kernel_real_inv_max, R=R, precision=_precision_poisson()
    )
    out = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[spec, spec, wspec],
        out_specs=[sspec],
        out_shape=[jax.ShapeDtypeStruct((m, 8, LEAF), xr.dtype)],
        scratch_shapes=[
            pltpu.VMEM((size, size), xr.dtype),
            pltpu.VMEM((size, size), xr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )(xr.reshape(m, size, size), xi.reshape(m, size, size), w)
    return out[0][:, 0, 0]


def fused_step_exact_prefix(
    qr, qi, s0, s12, pending, poisson_coeff: float, prefactor: float
):
    """The exact-dt mode's pre-step potential evaluation in FOUR passes on
    the skewed mixed-space state (the reference solves the potential once
    at t for dt and once at the drift midpoint for the kick; update :497
    and :530 — this is the ":497" solve):

      1. axis-0 roundtrip applying the DEFERRED closing kick of the
         previous step (psi(t) requires it; the opening kick of the new
         step is applied later by fused_step_3d_skewed once dt is known);
      2. fused2 inverse of (y,z) with rho = prefactor*|psi|^2 synthesized
         and forward-transformed in-register — psi(t) never hits HBM;
      3. one-kernel axis-0 Poisson roundtrip;
      4. fused2 real inverse reduced to max|phi| partials — phi(t) never
         hits HBM either.

    Returns (q1_re, q1_im, phi_max) with q1 the pending-kicked mixed-space
    state (feed it to fused_step_3d_skewed with kcoeff only)."""
    lead = qr.shape[:-3]
    n0 = qr.shape[-3]
    ax0 = qr.ndim - 3
    qr1, qi1 = _axis_pass_sublane_roundtrip_kick_reduce_sep(
        qr, qi, ax0, s0, s12, pending, 0.0, with_reduce=False
    )
    dr, di = _axis_pass_fused2_inv_density_rho_only(qr1, qi1, prefactor)
    dr, di = _axis_pass_sublane_roundtrip_poisson_sep(
        dr, di, ax0, s0, s12, poisson_coeff
    )
    mx = _axis_pass_fused2_real_inv_max(dr, di)
    phi_max = jnp.max(mx.reshape(lead + (n0,)), axis=-1)
    return qr1, qi1, phi_max


def skew_enter(psik: jnp.ndarray, dims: int):
    """complex psik (engine order) -> planar mixed-space q = F_0^-1[psik]
    (the skewed loop carrier; one sublane pass)."""
    assert dims == 3
    xr = jnp.real(psik)
    xi = jnp.imag(psik)
    return _axis_pass_sublane(xr, xi, psik.ndim - 3, inverse=True)


def skew_exit(qr, qi, s0, s12, pending, alias_cutoff: float):
    """Materialize (psi, psik, norm_sums, alias_sums) from the skewed
    mixed-space state: one axis-0 roundtrip applying the deferred kick
    exp(i*pending*k^2) (and emitting the final step's norm/alias
    reductions, which the skewed loop computes one iteration late), then
    psik = F_0[q'] and psi = F_{1,2}^-1[q'] — the same 3 passes the
    unskewed dump-boundary materialization costs."""
    lead = qr.shape[:-3]
    ax0 = qr.ndim - 3
    qr2, qi2, ns, am = _axis_pass_sublane_roundtrip_kick_reduce_sep(
        qr, qi, ax0, s0, s12, pending, alias_cutoff
    )
    kr, ki = _axis_pass_sublane(qr2, qi2, ax0, inverse=False)
    pr, pi = _axis_pass_fused2(qr2, qi2, inverse=True)
    ns = jnp.sum(ns.reshape(lead + (-1,)), axis=-1)
    am = jnp.sum(am.reshape(lead + (-1,)), axis=-1)
    return jax.lax.complex(pr, pi), jax.lax.complex(kr, ki), ns, am


def _axis_pass_sublane(xr, xi, axis: int, inverse: bool):
    """Transform axis `axis` (not the last) of planar arrays."""
    size = xr.shape[axis]
    R = size // LEAF
    w = jnp.asarray(_matrices(size, inverse, xr.dtype.name))
    axis = axis % xr.ndim
    lead = xr.shape[:axis]
    trail = xr.shape[axis + 1 :]
    b1 = int(np.prod(lead)) if lead else 1
    lanes = int(np.prod(trail)) if trail else 1
    assert lanes % LEAF == 0, "trailing extent must be a multiple of 128"
    xr3 = xr.reshape(b1, size, lanes)
    xi3 = xi.reshape(b1, size, lanes)
    width = min(_SUBLANE_LANES, lanes)
    while lanes % width:
        width -= LEAF
    grid = (b1, lanes // width)
    spec = pl.BlockSpec(
        (1, size, width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _sublane_kernel, R=R, inverse=inverse, precision=_precision()
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, wspec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
            jax.ShapeDtypeStruct((b1, size, lanes), xr.dtype),
        ],
        compiler_params=_cparams(2),
        interpret=_interpret(),
    )(xr3, xi3, w)
    shape = lead + (size,) + trail
    return out[0].reshape(shape), out[1].reshape(shape)


# ---------------------------------------------------------------------------
# Public transforms
# ---------------------------------------------------------------------------


def _fuse2_ok(shape, dims: int) -> bool:
    return _FUSE2 and dims >= 2 and shape[-2] == shape[-1]


def forward_engine(psi: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Ortho forward FFT over the last `dims` axes; k in ENGINE order."""
    xr = jnp.real(psi)
    xi = jnp.imag(psi)
    if _fuse2_ok(psi.shape, dims):
        xr, xi = _axis_pass_fused2(xr, xi, inverse=False)
        for ax in range(psi.ndim - dims, psi.ndim - 2):
            xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=False)
        return jax.lax.complex(xr, xi)
    xr, xi = _axis_pass_lane(xr, xi, psi.shape[-1], inverse=False)
    for ax in range(psi.ndim - dims, psi.ndim - 1):
        xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=False)
    return jax.lax.complex(xr, xi)


def inverse_engine(psik: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Ortho inverse FFT from ENGINE-order k to natural x."""
    xr = jnp.real(psik)
    xi = jnp.imag(psik)
    if _fuse2_ok(psik.shape, dims):
        for ax in range(psik.ndim - dims, psik.ndim - 2):
            xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=True)
        xr, xi = _axis_pass_fused2(xr, xi, inverse=True)
        return jax.lax.complex(xr, xi)
    for ax in range(psik.ndim - dims, psik.ndim - 1):
        xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=True)
    xr, xi = _axis_pass_lane(xr, xi, psik.shape[-1], inverse=True)
    return jax.lax.complex(xr, xi)


def _axis_pass_fused2_real(x_or_pair, inverse: bool):
    """Fused last-two-axes pass, real input (forward) / real output (inverse)."""
    if inverse:
        xr, xi = x_or_pair
    else:
        xr, xi = x_or_pair, None
    size = xr.shape[-1]
    assert xr.shape[-2] == size
    R = size // LEAF
    w = jnp.asarray(_matrices(size, inverse, xr.dtype.name))
    lead = xr.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    spec = pl.BlockSpec((1, size, size), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(
        (R, 2, LEAF, LEAF), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    common = dict(
        grid=(m,),
        scratch_shapes=[
            pltpu.VMEM((size, size), xr.dtype),
            pltpu.VMEM((size, size), xr.dtype),
        ],
        compiler_params=_cparams(1),
        interpret=_interpret(),
    )
    if not inverse:
        kern = functools.partial(_fused_kernel_real_fwd, R=R, precision=_precision_poisson())
        out = pl.pallas_call(
            kern,
            in_specs=[spec, wspec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((m, size, size), xr.dtype),
                jax.ShapeDtypeStruct((m, size, size), xr.dtype),
            ],
            **common,
        )(xr.reshape(m, size, size), w)
        shape = lead + (size, size)
        return out[0].reshape(shape), out[1].reshape(shape)
    kern = functools.partial(_fused_kernel_real_inv, R=R, precision=_precision_poisson())
    out = pl.pallas_call(
        kern,
        in_specs=[spec, spec, wspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, size, size), xr.dtype),
        **common,
    )(xr.reshape(m, size, size), xi.reshape(m, size, size), w)
    return out.reshape(lead + (size, size))


def forward_engine_real(rho: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Ortho forward FFT of a REAL field (the Poisson density): the first
    (lane) pass skips the zero imaginary plane — half its arithmetic."""
    if _fuse2_ok(rho.shape, dims):
        xr, xi = _axis_pass_fused2_real(rho, inverse=False)
        for ax in range(rho.ndim - dims, rho.ndim - 2):
            xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=False)
        return jax.lax.complex(xr, xi)
    xr, xi = _axis_pass_lane_real(rho, rho.shape[-1], inverse=False)
    for ax in range(rho.ndim - dims, rho.ndim - 1):
        xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=False)
    return jax.lax.complex(xr, xi)


def forward_engine_density(
    psi: jnp.ndarray, dims: int, prefactor: float
) -> jnp.ndarray:
    """Ortho forward FFT of rho = prefactor * |psi|^2 (calculate_density
    :1031-1063) with the density synthesized from the psi planes inside the
    first kernel pass — rho never touches HBM (dims==3 fused path)."""
    pr = jnp.real(psi)
    pi = jnp.imag(psi)
    if _fuse2_ok(psi.shape, dims) and dims == 3:
        xr, xi = _axis_pass_fused2_density(pr, pi, prefactor)
        for ax in range(psi.ndim - dims, psi.ndim - 2):
            xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=False)
        return jax.lax.complex(xr, xi)
    rho = jnp.asarray(prefactor, pr.dtype) * (pr * pr + pi * pi)
    return forward_engine_real(rho, dims)


def poisson_solve(psi: jnp.ndarray, dims: int, prefactor: float, pmap):
    """The whole spectral Poisson solve (calculate_potential :1031-1110) in
    THREE HBM passes for 3-D grids:

      1. fused2 density forward: rho = prefactor*|psi|^2 synthesized
         in-register, transformed over the last two axes;
      2. roundtrip pass: forward z-transform, -coeff/k^2 multiply and
         inverse z-transform in one kernel — rho_k never exists in HBM;
      3. fused2 real inverse: phi = Re F^-1 over the last two axes.

    pmap is the full k-space map in ENGINE order. Falls back to the
    two-call path (4 passes) off the fused geometry.
    """
    if _fuse2_ok(psi.shape, dims) and dims == 3:
        pr = jnp.real(psi)
        pi = jnp.imag(psi)
        xr, xi = _axis_pass_fused2_density(pr, pi, prefactor)
        xr, xi = _axis_pass_sublane_roundtrip_pmap(xr, xi, psi.ndim - 3, pmap)
        return _axis_pass_fused2_real((xr, xi), inverse=True)
    rho_k = forward_engine_density(psi, dims, prefactor)
    return inverse_engine_real(rho_k, dims, pmap=pmap)


def inverse_engine_real(
    phik: jnp.ndarray, dims: int, *, pmap=None
) -> jnp.ndarray:
    """Ortho inverse FFT keeping only the REAL part (the potential,
    phi = Re F^-1[phi_k], calculate_potential :1109): the final (lane)
    pass emits one plane — half its arithmetic.

    pmap: real k-space map in ENGINE order multiplied into phik on the
    transform's first read (the Poisson -coeff/k^2, k=0 zeroed, multiply,
    :1076-1102); fused in the dims==3 path, XLA elementwise otherwise.
    """
    xr = jnp.real(phik)
    xi = jnp.imag(phik)
    if _fuse2_ok(phik.shape, dims):
        first = True
        for ax in range(phik.ndim - dims, phik.ndim - 2):
            if first and pmap is not None and dims == 3:
                xr, xi = _axis_pass_sublane_inv_pmap(xr, xi, ax, pmap)
            else:
                if first and pmap is not None:
                    m = jnp.asarray(pmap, xr.dtype)
                    xr, xi = xr * m, xi * m
                xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=True)
            first = False
        if first and pmap is not None:
            m = jnp.asarray(pmap, xr.dtype)
            xr, xi = xr * m, xi * m
        return _axis_pass_fused2_real((xr, xi), inverse=True)
    if pmap is not None:
        m = jnp.asarray(pmap, xr.dtype)
        xr, xi = xr * m, xi * m
    for ax in range(phik.ndim - dims, phik.ndim - 1):
        xr, xi = _axis_pass_sublane(xr, xi, ax, inverse=True)
    return _axis_pass_lane_real((xr, xi), phik.shape[-1], inverse=True)


def forward(psi: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Natural-order ortho fftn (API parity with jnp.fft.fftn)."""
    return to_natural(forward_engine(psi, dims), dims)


def inverse(psik: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Natural-order ortho ifftn."""
    return inverse_engine(to_engine(psik, dims), dims)


class SingleEngine:
    """Single-device fused-step engine adapter.

    Normalizes the fused-step surface the stepper drives (fused_step /
    skewed variants / Poisson solve / transforms) so the spatially-sharded
    engine (`parallel.pfft_fused.ShardedEngine`) is a drop-in replacement:
    same methods, same return conventions, reductions already global.
    consts.spec_axis12 is the 2-D (size, size) k1^2+k2^2 table (the sharded
    layout shards its rows); the kernels want it flat.
    """

    def __init__(self, dims: int, poisson_coeff: float, alias_cutoff: float,
                 prefactor: float):
        self.dims = dims
        self.poisson_coeff = float(poisson_coeff)
        self.alias_cutoff = float(alias_cutoff)
        self.prefactor = float(prefactor)

    @staticmethod
    def _s12(consts):
        return consts.spec_axis12.reshape(-1)

    def fused_step(self, psik, consts, kick, vcoeff):
        return fused_step_3d(
            psik, consts.spec_axis0, self._s12(consts), kick, vcoeff,
            self.poisson_coeff, self.alias_cutoff, self.prefactor,
        )

    def fused_step_skewed(self, qr, qi, consts, kick, vcoeff):
        return fused_step_3d_skewed(
            qr, qi, consts.spec_axis0, self._s12(consts), kick, vcoeff,
            self.poisson_coeff, self.alias_cutoff, self.prefactor,
        )

    def exact_prefix(self, qr, qi, consts, pending):
        return fused_step_exact_prefix(
            qr, qi, consts.spec_axis0, self._s12(consts), pending,
            self.poisson_coeff, self.prefactor,
        )

    def skew_enter(self, psik):
        return skew_enter(psik, self.dims)

    def skew_exit(self, qr, qi, consts, pending):
        return skew_exit(
            qr, qi, consts.spec_axis0, self._s12(consts), pending,
            self.alias_cutoff,
        )

    def forward(self, psi):
        return forward_engine(psi, self.dims)

    def inverse(self, psik):
        return inverse_engine(psik, self.dims)

    def poisson_solve(self, psi, consts):
        return poisson_solve(psi, self.dims, self.prefactor, consts.poisson_map)
