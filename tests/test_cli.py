"""CLI surface tests: flag parsing and wiring that needs no device work."""

import logging

import pytest

from msm_tpu import cli


def test_simulate_flags_parse():
    args = cli.build_parser().parse_args(
        ["simulate", "--toml", "x.toml", "--fast-dt", "--check-eps", "2e-4"]
    )
    assert args.check_eps == pytest.approx(2e-4)
    assert args.fast_dt
    # production default dt semantics; --fast-dt stays a lagged alias
    assert args.dt_mode == "optimistic"
    args = cli.build_parser().parse_args(
        ["simulate", "--toml", "x.toml", "--dt-mode", "exact"]
    )
    assert args.dt_mode == "exact" and not args.fast_dt


def test_check_eps_defaults():
    import jax.numpy as jnp

    from msm_tpu.simulator import _resolve_check_eps

    # reference check_norm eps at f64 (grid.rs:35-64); measured
    # mixed-precision envelope at f32 (PARITY.md)
    assert _resolve_check_eps(None, jnp.complex128) == pytest.approx(1e-4)
    assert _resolve_check_eps(None, jnp.complex64) == pytest.approx(1e-3)
    assert _resolve_check_eps(5e-5, jnp.complex64) == pytest.approx(5e-5)


def test_synthesize_verbosity_sets_log_level():
    # the reference wires --verbosity into its logger
    # (synthesizer/src/main.rs:34-41); a dead flag would leave the root
    # logger untouched
    parser = cli.build_parser()
    args = parser.parse_args(
        ["synthesize", "--toml", "does-not-exist.toml", "--verbosity", "debug"]
    )
    root = logging.getLogger()
    before = root.level
    try:
        with pytest.raises(FileNotFoundError):
            args.fn(args)
        assert root.level == logging.DEBUG
    finally:
        root.setLevel(before)


def test_synthesize_verbosity_rejects_unknown_level():
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(
            ["synthesize", "--toml", "x.toml", "--verbosity", "loud"]
        )
