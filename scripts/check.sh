#!/usr/bin/env bash
# Full local validation: native build, test suite (CPU, 8 virtual devices),
# multichip dryrun, single-chip entry, and the TPU benchmark.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== native build ==="
make -C native

echo "=== test suite (CPU, 8 virtual devices) ==="
python -m pytest tests/ -q

echo "=== multichip dryrun (8 virtual CPU devices) ==="
JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python __graft_entry__.py multichip 8

echo "=== single-chip entry (TPU) ==="
python __graft_entry__.py

echo "=== benchmark (TPU) ==="
python bench.py
