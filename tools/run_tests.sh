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
# explicit test paths run just those modules (still one process each);
# other args (-m, -k, ...) pass through to every module's pytest
mods=()
pass=()
for a in "$@"; do
  case "$a" in
    tests/test_*.py*) mods+=("$a") ;;
    *) pass+=("$a") ;;
  esac
done
if [ ${#mods[@]} -eq 0 ]; then
  mods=(tests/test_*.py)
fi
for m in "${mods[@]}"; do
  echo "=== ${m}"
  python -m pytest "${m}" -q ${pass[@]+"${pass[@]}"} || fail=1
done
exit ${fail}
