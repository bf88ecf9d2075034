"""Grid utility tests (mirrors `simulator/src/utils/fft.rs:163-247` and
`simulator/src/utils/grid.rs:107-270`)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu import grid


def test_kgrid_hand_values():
    # Reference test: get_kgrid(0.25, 4) == [0, 1, -2, -1] (fft.rs:165-168)
    k = grid.get_kgrid(0.25, 4)
    np.testing.assert_allclose(k, [0.0, 1.0, -2.0, -1.0])


def test_kgrid_even_assertion():
    with pytest.raises(AssertionError):
        grid.get_kgrid(0.25, 5)


def test_spec_grid_vs_manual_triple_loop():
    # Reference test (fft.rs:185-216): manual triple loop comparison.
    size, dx = 4, 0.25
    k = grid.get_kgrid(dx, size)
    spec = grid.spec_grid(dx, 3, size)
    manual = np.zeros((size, size, size))
    for i in range(size):
        for j in range(size):
            for l in range(size):
                manual[i, j, l] = (k[i] ** 2 + k[j] ** 2 + k[l] ** 2) * (
                    2 * math.pi
                ) ** 2
    np.testing.assert_allclose(spec, manual, rtol=1e-12)


def test_k2_max_matches_spec_grid():
    for dims in (1, 2, 3):
        spec = grid.spec_grid(30 / 16, dims, 16)
        assert grid.k2_max(30 / 16, dims, 16) == pytest.approx(float(spec.max()))


@pytest.mark.parametrize("dims", [1, 2, 3])
@pytest.mark.parametrize("dtype", [jnp.complex64, jnp.complex128])
def test_normalize(dims, dtype):
    # Reference tests: grid.rs:107-270 (1/2/3-D, f32 and f64)
    size = 8
    dx = 1.0 / size
    psi = jnp.full((size,) * dims, 1.0 + 1.0j, dtype)
    psi = grid.normalize(psi, dx, dims)
    norm = float(grid.norm_squared(psi, dx, dims))
    assert norm == pytest.approx(1.0, abs=1e-6)
    assert grid.check_norm(psi, dx, dims)


def test_check_finite():
    ok = jnp.ones((4, 4), jnp.complex64)
    assert grid.check_finite(ok)
    bad = ok.at[0, 0].set(jnp.nan + 0j)
    assert not grid.check_finite(bad)
    inf = ok.at[1, 1].set(jnp.inf + 0j)
    assert not grid.check_finite(inf)
