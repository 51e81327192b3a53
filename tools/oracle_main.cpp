// Oracle driver: run the reference fixed-grid encode (limg_encode3d_test)
// on a PNG and report PSNR + planes, so the TPU rebuild's fixed-grid
// pipeline can be quality-compared against the reference without the
// merging pass. Build-local only (gitignored).
#include "limg.h"
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#define STB_IMAGE_IMPLEMENTATION (1)
#include "stb_image.h"

int main(int argc, const char **argv)
{
  if (argc < 2) { printf("usage: oracle <img> [errorFactor] [fastCrush0/1] [threads0/1]\n"); return 1; }
  const uint32_t errorFactor = argc > 2 ? (uint32_t)atoi(argv[2]) : 100;
  const bool fastCrush = argc > 3 ? atoi(argv[3]) != 0 : true;
  const bool useThreads = argc > 4 ? atoi(argv[4]) != 0 : false;

  int w, h, comp;
  uint32_t *pIn = (uint32_t *)stbi_load(argv[1], &w, &h, &comp, 4);
  if (!pIn) { printf("load failed\n"); return 1; }
  const bool hasAlpha = comp == 4;
  const size_t n = (size_t)w * h;

  limg_encode3d_info info;
  info.pDecoded = (uint32_t *)calloc(n, 4);
  info.pShiftABCX = (uint32_t *)calloc(n, 4);
  info.pColAMin = (uint32_t *)calloc(n, 4);
  info.pColAMax = (uint32_t *)calloc(n, 4);
  info.pColBMin = (uint32_t *)calloc(n, 4);
  info.pColBMax = (uint32_t *)calloc(n, 4);
  info.pColCMin = (uint32_t *)calloc(n, 4);
  info.pColCMax = (uint32_t *)calloc(n, 4);
  info.pFactorsA = (uint8_t *)calloc(n, 1);
  info.pFactorsB = (uint8_t *)calloc(n, 1);
  info.pFactorsC = (uint8_t *)calloc(n, 1);

  limg_thread_pool *pPool = useThreads ? limg_thread_pool_new(limg_threading_max_threads()) : nullptr;
  limg_result res = limg_encode3d_test(pIn, w, h, hasAlpha, &info, errorFactor, pPool, fastCrush);
  if (res != limg_success) { printf("encode failed %d\n", res); return 1; }

  double mean, mx;
  const double psnr = limg_compare(pIn, info.pDecoded, w, h, hasAlpha, &mean, &mx);
  printf("ORACLE psnr=%.4f mse=%.4f hasAlpha=%d\n", psnr, mean, (int)hasAlpha);

  // dump decoded + shift planes for fixture comparisons
  if (argc > 5) {
    FILE *f = fopen(argv[5], "wb");
    fwrite(&w, 4, 1, f); fwrite(&h, 4, 1, f);
    fwrite(info.pDecoded, 4, n, f);
    fwrite(info.pShiftABCX, 4, n, f);
    fwrite(info.pFactorsA, 1, n, f);
    fwrite(info.pFactorsB, 1, n, f);
    fwrite(info.pFactorsC, 1, n, f);
    fclose(f);
  }
  return 0;
}
