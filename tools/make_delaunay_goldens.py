"""Golden Delaunay fixtures from the reference Shewchuk triangulator.

Compiles /root/reference/src/elas/triangle.cpp standalone into a scratch
dir (reference code never enters this repo) with a tiny driver that mirrors
computeDelaunayTriangulation (elas.cpp:445-505): read 2D float points, run
triangulate("zQB"), emit the ordered trianglelist. Fixture inputs cover the
degenerate cases that matter for ELAS support grids: regular 5-px lattices
(maximally co-circular), jittered lattices, random integer points,
collinear runs, duplicate points, and real ELAS support sets extracted from
the existing stage fixtures.

Usage: python tools/make_delaunay_goldens.py
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
TRI_SRC = "/root/reference/src/elas"

MAIN_CPP = r"""
#include <cstdio>
#include <cstdlib>
#include "triangle.h"
int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "rb");
  int n; if (fread(&n, 4, 1, f) != 1) return 2;
  struct triangulateio in, out;
  in.numberofpoints = n;
  in.pointlist = (float*)malloc(n*2*sizeof(float));
  if ((int)fread(in.pointlist, sizeof(float), 2*n, f) != 2*n) return 2;
  fclose(f);
  in.numberofpointattributes = 0;
  in.pointattributelist = NULL;
  in.pointmarkerlist = NULL;
  in.numberofsegments = 0;
  in.numberofholes = 0;
  in.numberofregions = 0;
  in.regionlist = NULL;
  out.pointlist = NULL;
  out.pointattributelist = NULL;
  out.pointmarkerlist = NULL;
  out.trianglelist = NULL;
  out.triangleattributelist = NULL;
  out.neighborlist = NULL;
  out.segmentlist = NULL;
  out.segmentmarkerlist = NULL;
  out.edgelist = NULL;
  out.edgemarkerlist = NULL;
  char params[] = "zQB";
  triangulate(params, &in, &out, NULL);
  FILE* o = fopen(argv[2], "wb");
  fwrite(&out.numberoftriangles, 4, 1, o);
  fwrite(out.trianglelist, 4, 3*out.numberoftriangles, o);
  fclose(o);
  return 0;
}
"""


def build_binary(workdir: str) -> str:
    main = os.path.join(workdir, "main.cpp")
    with open(main, "w") as f:
        f.write(MAIN_CPP)
    exe = os.path.join(workdir, "tri_golden")
    # the reference build of triangle.cpp (CMakeLists: -msse3, C++; the
    # bundled header is pre-configured with float coords)
    cmd = [
        "g++", "-O2", "-msse3", "-I", TRI_SRC, main,
        os.path.join(TRI_SRC, "triangle.cpp"), "-o", exe, "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return exe


def run_case(exe: str, workdir: str, pts: np.ndarray) -> np.ndarray:
    pin = os.path.join(workdir, "pts.bin")
    pout = os.path.join(workdir, "tri.bin")
    with open(pin, "wb") as f:
        f.write(np.int32(len(pts)).tobytes())
        f.write(pts.astype(np.float32).tobytes())
    subprocess.run([exe, pin, pout], check=True, timeout=60)
    raw = open(pout, "rb").read()
    nt = np.frombuffer(raw[:4], np.int32)[0]
    tri = np.frombuffer(raw[4:], np.int32).reshape(nt, 3)
    return tri.copy()


def make_cases():
    rng = np.random.default_rng(42)
    cases = {}
    # regular lattice (the ELAS support grid shape: co-circular everywhere)
    gx, gy = np.meshgrid(np.arange(2, 60, 5), np.arange(2, 40, 5))
    cases["lattice5"] = np.stack([gx.ravel(), gy.ravel()], -1).astype(
        np.float32)
    # lattice with holes (support pruning leaves gaps)
    full = cases["lattice5"]
    keep = rng.random(len(full)) > 0.3
    cases["lattice5_holes"] = full[keep]
    # jittered lattice
    cases["lattice_jitter"] = (
        full + rng.integers(-1, 2, full.shape)).astype(np.float32)
    # random integer points (dedup: triangle merges duplicates, which
    # renumbers output indices — ELAS support sets never contain dupes)
    ri = rng.integers(0, 320, (400, 2))
    ri = np.unique(ri, axis=0)
    cases["rand_int"] = ri.astype(np.float32)
    # small: triangle, square (one co-circular quad), collinear + one
    cases["tri3"] = np.array([[0, 0], [10, 0], [5, 8]], np.float32)
    cases["square4"] = np.array(
        [[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    cases["colinear_plus"] = np.array(
        [[0, 0], [5, 0], [10, 0], [15, 0], [7, 9]], np.float32)
    # concentric co-circular ring (3-4-5 style pythagorean lattice points)
    ring = []
    for (a, b) in [(5, 0), (4, 3), (3, 4), (0, 5), (-3, 4), (-4, 3),
                   (-5, 0), (-4, -3), (-3, -4), (0, -5), (4, -3), (3, -4)]:
        ring.append((a * 5 + 50, b * 5 + 50))
    cases["cocircular12"] = np.array(ring, np.float32)
    cases["cocircular12_c"] = np.array(ring + [(50, 50)], np.float32)
    # right-image style coordinates: u-d can collide after subtraction ->
    # near-duplicate columns (keep integer grid, shifted)
    sh = full.copy()
    sh[:, 0] -= rng.integers(0, 12, len(sh)).astype(np.float32)
    cases["lattice_shifted"] = sh
    # larger random for stress
    rb = rng.integers(0, 640, (1500, 2))
    rb = np.unique(rb, axis=0)
    cases["rand_big"] = rb.astype(np.float32)
    return cases


def extract_support_sets():
    """Real ELAS support sets via the repo pipeline on the stage fixtures."""
    sys.path.insert(0, REPO)
    cases = {}
    try:
        from jackal_tpu.matching.elas.pipeline import elas_match
        from jackal_tpu.config import ElasParams
        for name in ("elas_stages_st320", "elas_stages_st160"):
            path = os.path.join(FIXDIR, name + ".npz")
            if not os.path.exists(path):
                continue
            z = np.load(path)
            if "support" in z:
                sup = z["support"].astype(np.float32)
            else:
                out = elas_match(z["left"], z["right"], ElasParams(),
                                 return_debug=True)
                sup = out[2].support.astype(np.float32)
            cases[f"support_{name[-5:]}_L"] = sup[:, :2]
            cases[f"support_{name[-5:]}_R"] = np.stack(
                [sup[:, 0] - sup[:, 2], sup[:, 1]], -1)
    except Exception as e:  # pragma: no cover
        print(f"support extraction skipped: {e}")
    return cases


def main():
    cases = make_cases()
    cases.update(extract_support_sets())
    with tempfile.TemporaryDirectory() as wd:
        exe = build_binary(wd)
        out = {}
        for name, pts in cases.items():
            tri = run_case(exe, wd, pts)
            out[f"{name}_pts"] = pts
            out[f"{name}_tri"] = tri
            print(f"{name}: {len(pts)} pts -> {len(tri)} triangles")
        np.savez_compressed(
            os.path.join(FIXDIR, "delaunay_golden.npz"), **out)
    print("wrote tests/fixtures/delaunay_golden.npz")


if __name__ == "__main__":
    main()
