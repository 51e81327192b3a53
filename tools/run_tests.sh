#!/usr/bin/env bash
# Suite runner with per-module process isolation.
#
# XLA:CPU's LLVM backend segfaults compiling (and its cache path segfaults
# serializing/deserializing) the largest merged/legacy graphs once a single
# process already holds many compiled executables -- state-dependent and
# reproduced with the native runtime fully disabled, so it is a jax/XLA:CPU
# limitation, not ours. Running each test module in its own process keeps
# every compile far from that cliff. Extra args pass through to pytest
# (e.g. tools/run_tests.sh -m "not slow").
set -u
cd "$(dirname "$0")/.."
fail=0
for m in tests/test_*.py; do
  echo "=== ${m}"
  python -m pytest "${m}" -q "$@" || fail=1
done
exit ${fail}
