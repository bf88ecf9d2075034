#!/usr/bin/env bash
# Feature-matrix smoke test (counterpart of the reference's test.sh:1-14):
# simulate + synthesize the spherical-tophat examples across the feature
# matrix — static / expanding x offline / online synthesis — on the CPU
# backend. Run from the repo root; writes into a temp dir.
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

run() {
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="$ROOT" "$@"
}

echo "== static + offline synthesis =="
run python -m msm_tpu simulate --toml /root/reference/examples/spherical-tophat.toml
run python -m msm_tpu synthesize --toml /root/reference/examples/spherical-tophat.toml

echo "== static + online synthesis =="
run python -m msm_tpu simulate --toml /root/reference/examples/spherical-tophat.toml \
    --data-root sim-online --online-synthesis

echo "== expanding (cosmology table) =="
run python -m msm_tpu simulate --toml /root/reference/examples/spherical-tophat-cosmo.toml
run python -m msm_tpu synthesize --toml /root/reference/examples/spherical-tophat-cosmo.toml

echo "== fast-dt + resume dry paths =="
run python -m msm_tpu simulate --toml /root/reference/examples/spherical-tophat.toml \
    --data-root sim-fast --fast-dt
run python -m msm_tpu simulate --toml /root/reference/examples/spherical-tophat.toml \
    --data-root sim-fast --resume   # everything checkpointed: no-op restart

echo "== test-only construction =="
run python -m msm_tpu simulate --toml /root/reference/examples/spherical-tophat.toml \
    --data-root sim-test --test

echo "SMOKE OK"
