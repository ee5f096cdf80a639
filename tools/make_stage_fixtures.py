"""Stage-level golden fixtures from an instrumented reference libelas build.

Copies reference elas.cpp into a scratch dir, inserts dump hooks at stage
boundaries (descriptors, support points, disparity grids, dense matching,
L/R check, speckle removal, gap interpolation, adaptive mean), compiles, and
runs it on the synthetic scenes. Only the *outputs* land in the repo, as
tests/fixtures/elas_stages_*.npz.

Usage: python tools/make_stage_fixtures.py
"""
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
ELAS_SRC = "/root/reference/src/elas"
sys.path.insert(0, os.path.join(REPO, "tools"))
from make_golden_fixtures import make_scene  # noqa: E402

DUMP_HELPER = r"""
#include <cstdio>
static const char* g_dump_prefix = 0;
static void dump_blob(const char* stage, const void* data, size_t bytes) {
  if (!g_dump_prefix) return;
  char name[512];
  snprintf(name, 512, "%s_%s.raw", g_dump_prefix, stage);
  FILE* f = fopen(name, "wb");
  fwrite(data, 1, bytes, f);
  fclose(f);
}
void elas_set_dump_prefix(const char* p);
void elas_set_dump_prefix(const char* p) { g_dump_prefix = p; }
"""

# (anchor line, code inserted AFTER it)
PATCHES = [
    ("#include \"matrix.h\"", DUMP_HELPER),
    ("vector<support_pt> p_support = computeSupportMatches(desc1.I_desc,desc2.I_desc);",
     r"""
  dump_blob("desc1", desc1.I_desc, (size_t)16*width*height);
  dump_blob("desc2", desc2.I_desc, (size_t)16*width*height);
  {
    std::vector<int32_t> sp;
    for (size_t i=0;i<p_support.size();++i){sp.push_back(p_support[i].u);sp.push_back(p_support[i].v);sp.push_back(p_support[i].d);}
    dump_blob("support", sp.data(), sp.size()*4);
  }
"""),
    ("createGrid(p_support,disparity_grid_2,grid_dims,1);",
     r"""
  dump_blob("grid1", disparity_grid_1, (size_t)(param.disp_max+2)*grid_height*grid_width*4);
  dump_blob("grid2", disparity_grid_2, (size_t)(param.disp_max+2)*grid_height*grid_width*4);
  {
    std::vector<float> planes;
    for (size_t i=0;i<tri_1.size();++i){planes.push_back(tri_1[i].t1a);planes.push_back(tri_1[i].t1b);planes.push_back(tri_1[i].t1c);planes.push_back(tri_1[i].t2a);planes.push_back(tri_1[i].t2b);planes.push_back(tri_1[i].t2c);}
    dump_blob("planes1", planes.data(), planes.size()*4);
    std::vector<int32_t> tl;
    for (size_t i=0;i<tri_1.size();++i){tl.push_back(tri_1[i].c1);tl.push_back(tri_1[i].c2);tl.push_back(tri_1[i].c3);}
    dump_blob("tri1", tl.data(), tl.size()*4);
    std::vector<float> planes2;
    for (size_t i=0;i<tri_2.size();++i){planes2.push_back(tri_2[i].t1a);planes2.push_back(tri_2[i].t1b);planes2.push_back(tri_2[i].t1c);planes2.push_back(tri_2[i].t2a);planes2.push_back(tri_2[i].t2b);planes2.push_back(tri_2[i].t2c);}
    dump_blob("planes2", planes2.data(), planes2.size()*4);
    std::vector<int32_t> tl2;
    for (size_t i=0;i<tri_2.size();++i){tl2.push_back(tri_2[i].c1);tl2.push_back(tri_2[i].c2);tl2.push_back(tri_2[i].c3);}
    dump_blob("tri2", tl2.data(), tl2.size()*4);
  }
"""),
    ("computeDisparity(p_support,tri_2,disparity_grid_2,grid_dims,desc1.I_desc,desc2.I_desc,1,D2);",
     r"""
  dump_blob("dense_D1", D1, (size_t)width*height*4);
  dump_blob("dense_D2", D2, (size_t)width*height*4);
"""),
    ("leftRightConsistencyCheck(D1,D2);",
     r"""
  dump_blob("lr_D1", D1, (size_t)width*height*4);
  dump_blob("lr_D2", D2, (size_t)width*height*4);
"""),
    ("  removeSmallSegments(D1);",
     "  dump_blob(\"speckle_D1\", D1, (size_t)width*height*4);\n"),
    ("  gapInterpolation(D1);",
     "  dump_blob(\"gap_D1\", D1, (size_t)width*height*4);\n"),
]

MAIN_CPP = r"""
#include "elas.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
void elas_set_dump_prefix(const char* p);
int main(int argc, char** argv) {
  int W = atoi(argv[3]), H = atoi(argv[4]);
  const char* preset = argv[5];
  std::vector<uint8_t> I1(W*H), I2(W*H);
  FILE* f1 = fopen(argv[1], "rb"); if (fread(I1.data(),1,W*H,f1)!=(size_t)(W*H)) return 2; fclose(f1);
  FILE* f2 = fopen(argv[2], "rb"); if (fread(I2.data(),1,W*H,f2)!=(size_t)(W*H)) return 2; fclose(f2);
  std::vector<float> D1(W*H), D2(W*H);
  Elas::parameters param(strcmp(preset,"MIDDLEBURY")==0 ? Elas::MIDDLEBURY : Elas::ROBOTICS);
  if (strcmp(preset,"ROBOTICS_SUB")==0) param.subsampling = true;
  Elas elas(param);
  elas_set_dump_prefix(argv[6]);
  const int32_t dims[3] = {W, H, W};
  elas.process(I1.data(), I2.data(), D1.data(), D2.data(), dims);
  char name[512];
  snprintf(name,512,"%s_final_D1.raw",argv[6]);
  FILE* o1=fopen(name,"wb"); fwrite(D1.data(),4,W*H,o1); fclose(o1);
  snprintf(name,512,"%s_final_D2.raw",argv[6]);
  FILE* o2=fopen(name,"wb"); fwrite(D2.data(),4,W*H,o2); fclose(o2);
  return 0;
}
"""


def build_instrumented(wd: str) -> str:
    for f in ["elas.h", "descriptor.h", "descriptor.cpp", "filter.h",
              "filter.cpp", "matrix.h", "matrix.cpp", "triangle.h",
              "triangle.cpp", "timer.h"]:
        shutil.copy(os.path.join(ELAS_SRC, f), wd)
    with open(os.path.join(ELAS_SRC, "elas.cpp")) as f:
        src = f.read()
    for anchor, ins in PATCHES:
        assert anchor in src, anchor
        src = src.replace(anchor, anchor + "\n" + ins, 1)
    with open(os.path.join(wd, "elas.cpp"), "w") as f:
        f.write(src)
    with open(os.path.join(wd, "main.cpp"), "w") as f:
        f.write(MAIN_CPP)
    out = os.path.join(wd, "elas_stages")
    subprocess.run(
        ["g++", "-O2", "-msse3", f"-I{wd}", "-o", out,
         os.path.join(wd, "main.cpp"), os.path.join(wd, "elas.cpp"),
         os.path.join(wd, "descriptor.cpp"), os.path.join(wd, "filter.cpp"),
         os.path.join(wd, "matrix.cpp"), os.path.join(wd, "triangle.cpp")],
        check=True, capture_output=True)
    return out


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    rng = np.random.default_rng(123)
    with tempfile.TemporaryDirectory() as wd:
        binary = build_instrumented(wd)
        scenes = [
            ("st160", 160, 120, 25.0, "boxes", "ROBOTICS"),
            ("st320", 320, 184, 40.0, "boxes", "ROBOTICS"),
            ("sub320", 320, 184, 40.0, "boxes", "ROBOTICS_SUB"),
        ]
        for name, W, H, dbase, kind, preset in scenes:
            left, right, dtrue = make_scene(rng, H, W, dbase, kind)
            lf = os.path.join(wd, f"{name}_l.raw")
            rf = os.path.join(wd, f"{name}_r.raw")
            left.tofile(lf); right.tofile(rf)
            prefix = os.path.join(wd, name)
            subprocess.run([binary, lf, rf, str(W), str(H), preset, prefix],
                           check=True)
            gw = int(np.ceil(W / 20)); gh = int(np.ceil(H / 20))
            sub = preset == "ROBOTICS_SUB"
            Wd, Hd = (W // 2, H // 2) if sub else (W, H)
            def raw(stage, dt, shape=None):
                a = np.fromfile(f"{prefix}_{stage}.raw", dt)
                if shape is not None:
                    n = int(np.prod(shape))
                    return a[:n].reshape(shape)
                return a
            ntri1 = len(raw("tri1", np.int32)) // 3
            ntri2 = len(raw("tri2", np.int32)) // 3
            np.savez_compressed(
                os.path.join(FIXDIR, f"elas_stages_{name}.npz"),
                left=left, right=right,
                desc1=raw("desc1", np.uint8, (H, W, 16)),
                desc2=raw("desc2", np.uint8, (H, W, 16)),
                support=raw("support", np.int32).reshape(-1, 3),
                tri1=raw("tri1", np.int32, (ntri1, 3)),
                tri2=raw("tri2", np.int32, (ntri2, 3)),
                planes1=raw("planes1", np.float32, (ntri1, 6)),
                planes2=raw("planes2", np.float32, (ntri2, 6)),
                grid1=raw("grid1", np.int32, (gh, gw, 257)),
                grid2=raw("grid2", np.int32, (gh, gw, 257)),
                dense_D1=raw("dense_D1", np.float32, (Hd, Wd)),
                dense_D2=raw("dense_D2", np.float32, (Hd, Wd)),
                lr_D1=raw("lr_D1", np.float32, (Hd, Wd)),
                lr_D2=raw("lr_D2", np.float32, (Hd, Wd)),
                speckle_D1=raw("speckle_D1", np.float32, (Hd, Wd)),
                gap_D1=raw("gap_D1", np.float32, (Hd, Wd)),
                final_D1=raw("final_D1", np.float32, (Hd, Wd)),
                final_D2=raw("final_D2", np.float32, (Hd, Wd)),
            )
            ns = len(raw("support", np.int32)) // 3
            print(f"{name}: {ns} support pts, {ntri1}/{ntri2} tris")


if __name__ == "__main__":
    sys.exit(main())
