#!/bin/sh
# Full CPU test suite as ONE command, in the two-chunk split that avoids
# the XLA:CPU mid-suite segfault (backend_compile_and_load crashes ~50%
# of one-process full-suite runs after a VM migration changed reported
# host CPU features; every file-level run passes - see CLAUDE.md).
# Usage: bash scripts/test.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
export XLA_FLAGS=--xla_force_host_platform_device_count=8
export JAX_PLATFORMS=cpu
python -m pytest tests/ --deselect tests/test_team_combat.py -q "$@"
python -m pytest tests/test_team_combat.py -q "$@"
