#!/bin/bash
# Build the CPU reference (read-only at /root/reference) into .refbuild/ as
# the baseline/parity oracle per BASELINE.md. The sources need three small
# portability patches for gcc (MSVC-isms); the patched copy stays gitignored.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p .refbuild/src
cp /root/reference/src/*.cpp /root/reference/src/*.h .refbuild/src/
cd .refbuild
# gcc rejects __attribute__((target)) before `template`; we compile with
# -msse4.1 globally instead.
sed -i 's/__attribute__((target("sse4.1")))//' src/*.h src/*.cpp
# gcc rejects goto over initializations; hoist/guard them.
python3 - <<'EOF'
src = open('src/limg.cpp').read()
src = src.replace(
    "  size_t accum_bits[3 + 3 * 9] = { 0 };\n\n  if (ctx.hasAlpha)\n    LIMG_ERROR_CHECK",
    "  memset(accum_bits, 0, sizeof(accum_bits));\n\n  if (ctx.hasAlpha)\n    LIMG_ERROR_CHECK")
src = src.replace(
    "limg_result limg_blocked_encode3d_test(const uint32_t *pIn, const size_t sizeX, const size_t sizeY, const bool hasAlpha, limg_blocked_encode3d_info *pInfo, const uint32_t errorFactor, limg_thread_pool *pThreadPool, const bool fastBitCrushing)\n{\n  limg_result result = limg_success;",
    "limg_result limg_blocked_encode3d_test(const uint32_t *pIn, const size_t sizeX, const size_t sizeY, const bool hasAlpha, limg_blocked_encode3d_info *pInfo, const uint32_t errorFactor, limg_thread_pool *pThreadPool, const bool fastBitCrushing)\n{\n  limg_result result = limg_success;\n  size_t accum_bits[3 + 3 * 9];")
src = src.replace(
    "#ifdef PRINT_TEST_OUTPUT\n  const size_t totalPixels = ctx.sizeX * ctx.sizeY;",
    "#ifdef PRINT_TEST_OUTPUT\n  {\n  const size_t totalPixels = ctx.sizeX * ctx.sizeY;")
src = src.replace("#endif\n\n  goto epilogue;", "  }\n#endif\n\n  goto epilogue;")
open('src/limg.cpp','w').write(src)
s2 = open('src/limg_simd.cpp').read().replace('_xgetbv', 'ref_limg_xgetbv')
open('src/limg_simd.cpp','w').write(s2)
EOF
FLAGS="-O2 -std=c++17 -msse4.1 -mssse3 -maes -ffast-math -include climits -I/root/reference/3rdParty/stb/include"
g++ $FLAGS src/limg.cpp src/limg_simd.cpp src/limg_threading.cpp src/main.cpp -o limg -lpthread
cp ../tools/oracle_main.cpp . 
if [ -f oracle_main.cpp ]; then
  g++ $FLAGS -Isrc oracle_main.cpp src/limg.cpp src/limg_simd.cpp src/limg_threading.cpp -o oracle -lpthread
fi
echo "built .refbuild/limg (and oracle if present)"
