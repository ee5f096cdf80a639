"""Generate golden fixtures for the L2 filter kernels from the reference.

Compiles the *reference* filter.cpp (SSE) standalone in a scratch dir and
dumps sobel5x5 / checkerboard5x5 / blob5x5 / integral_image outputs for a
random uint8 image into tests/fixtures/filters_golden.npz. The output
buffers are calloc'd so the regions the SSE code never writes are zeros,
and the int16 temp/input tails it reads past allocation are padded zero
pages (matching ops/filters.py's documented conventions).

Usage: python tools/make_filter_fixtures.py
"""
import os
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
ELAS_SRC = "/root/reference/src/elas"

MAIN_CPP = r"""
#include "filter.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
int main(int argc, char** argv) {
  int W = atoi(argv[2]), H = atoi(argv[3]);
  // generous zero tail: the SSE row passes read up to one vector past end
  uint8_t* in = (uint8_t*)calloc(W*H + 64, 1);
  FILE* f = fopen(argv[1], "rb");
  if (fread(in, 1, W*H, f) != (size_t)(W*H)) return 2;
  fclose(f);
  uint8_t* du = (uint8_t*)calloc(W*H + 64, 1);
  uint8_t* dv = (uint8_t*)calloc(W*H + 64, 1);
  filter::sobel5x5(in, du, dv, W, H);
  int16_t* cb = (int16_t*)calloc(W*H + 64, 2);
  filter::checkerboard5x5(in, cb, W, H);
  int16_t* bl = (int16_t*)calloc(W*H + 64, 2);
  filter::blob5x5(in, bl, W, H);
  int32_t* ii = (int32_t*)calloc(W*H + 64, 4);
  filter::detail::integral_image(in, ii, W, H);
  char name[512];
  #define DUMP(arr, sz, tag) { \
    snprintf(name, 512, "%s_" tag ".raw", argv[4]); \
    FILE* o = fopen(name, "wb"); fwrite(arr, sz, W*H, o); fclose(o); }
  DUMP(du, 1, "du"); DUMP(dv, 1, "dv");
  DUMP(cb, 2, "cb"); DUMP(bl, 2, "bl"); DUMP(ii, 4, "ii");
  return 0;
}
"""


def main():
    rng = np.random.default_rng(42)
    H, W = 64, 96            # width % 16 == 0 (SSE contract)
    img = (rng.random((H, W)) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as wd:
        with open(os.path.join(wd, "main.cpp"), "w") as f:
            f.write(MAIN_CPP)
        exe = os.path.join(wd, "filters")
        subprocess.run(
            ["g++", "-O2", "-msse3", f"-I{ELAS_SRC}",
             os.path.join(wd, "main.cpp"),
             os.path.join(ELAS_SRC, "filter.cpp"), "-o", exe],
            check=True)
        raw = os.path.join(wd, "img.raw")
        img.tofile(raw)
        tag = os.path.join(wd, "out")
        subprocess.run([exe, raw, str(W), str(H), tag], check=True)
        du = np.fromfile(f"{tag}_du.raw", np.uint8).reshape(H, W)
        dv = np.fromfile(f"{tag}_dv.raw", np.uint8).reshape(H, W)
        cb = np.fromfile(f"{tag}_cb.raw", np.int16).reshape(H, W)
        bl = np.fromfile(f"{tag}_bl.raw", np.int16).reshape(H, W)
        ii = np.fromfile(f"{tag}_ii.raw", np.int32).reshape(H, W)
    out = os.path.join(FIXDIR, "filters_golden.npz")
    np.savez_compressed(out, img=img, du=du, dv=dv, cb=cb, bl=bl, ii=ii)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
