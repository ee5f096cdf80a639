"""Generate golden ELAS fixtures from the reference libelas.

Builds synthetic stereo pairs with a known smooth disparity field, runs the
*reference* libelas (compiled standalone from /root/reference/src/elas into a
scratch dir — reference code never enters this repo) and stores inputs +
golden disparity outputs as tests/fixtures/elas_golden_*.npz.

Usage: python tools/make_golden_fixtures.py
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
ELAS_SRC = "/root/reference/src/elas"

MAIN_CPP = r"""
#include "elas.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
int main(int argc, char** argv) {
  int W = atoi(argv[3]), H = atoi(argv[4]);
  const char* preset = argv[5];
  std::vector<uint8_t> I1(W*H), I2(W*H);
  FILE* f1 = fopen(argv[1], "rb"); if (fread(I1.data(), 1, W*H, f1) != (size_t)(W*H)) return 2; fclose(f1);
  FILE* f2 = fopen(argv[2], "rb"); if (fread(I2.data(), 1, W*H, f2) != (size_t)(W*H)) return 2; fclose(f2);
  std::vector<float> D1(W*H), D2(W*H);
  Elas::parameters param(strcmp(preset, "MIDDLEBURY") == 0 ? Elas::MIDDLEBURY : Elas::ROBOTICS);
  Elas elas(param);
  const int32_t dims[3] = {W, H, W};
  elas.process(I1.data(), I2.data(), D1.data(), D2.data(), dims);
  char name[512];
  snprintf(name, 512, "%s_D1.raw", argv[6]);
  FILE* o1 = fopen(name, "wb"); fwrite(D1.data(), 4, W*H, o1); fclose(o1);
  snprintf(name, 512, "%s_D2.raw", argv[6]);
  FILE* o2 = fopen(name, "wb"); fwrite(D2.data(), 4, W*H, o2); fclose(o2);
  return 0;
}
"""


def build_golden_binary(workdir: str) -> str:
    main = os.path.join(workdir, "main.cpp")
    with open(main, "w") as f:
        f.write(MAIN_CPP)
    out = os.path.join(workdir, "elas_golden")
    srcs = [os.path.join(ELAS_SRC, s) for s in
            ["elas.cpp", "descriptor.cpp", "filter.cpp", "matrix.cpp",
             "triangle.cpp"]]
    subprocess.run(
        ["g++", "-O2", "-msse3", f"-I{ELAS_SRC}", "-o", out, main] + srcs,
        check=True, capture_output=True)
    return out


def smooth_noise(rng, H, W, sigma_px: float, amp: float) -> np.ndarray:
    """Band-limited noise via Fourier low-pass (no scipy dependency)."""
    n = rng.standard_normal((H, W))
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    filt = np.exp(-((fx ** 2 + fy ** 2) * (2 * np.pi * sigma_px) ** 2) / 2)
    s = np.fft.ifft2(np.fft.fft2(n) * filt).real
    s = (s - s.mean()) / (s.std() + 1e-9)
    return s * amp


def make_scene(rng, H, W, d_base: float, seed_kind: str):
    """Synthetic scene: world texture + smooth disparity field (+ boxes)."""
    # fine but band-limited texture so Sobel gradients are informative
    pad = 320
    tex = smooth_noise(rng, H, W + pad, 1.5, 60.0) + \
        smooth_noise(rng, H, W + pad, 6.0, 40.0) + 128.0
    tex = np.clip(tex, 0, 255)

    d = np.full((H, W), d_base, dtype=np.float64)
    d += smooth_noise(rng, H, W, 30.0, 3.0)
    # vertical slant (like a ground plane receding upward)
    d += np.linspace(6, -6, H)[:, None]
    if seed_kind == "boxes":
        for _ in range(4):
            bw = rng.integers(30, 80)
            bh = rng.integers(25, 60)
            y0 = rng.integers(0, H - bh)
            x0 = rng.integers(0, W - bw)
            d[y0:y0 + bh, x0:x0 + bw] = d_base + rng.uniform(15, 45)
    d = np.clip(d, 2.0, 120.0)

    # left[v,u] = W(v, u-d); right[v,u] = W(v,u)  (left pixel u matches
    # right pixel u-d). Offset world coords by pad so indices stay positive.
    u = np.arange(W)[None, :] + pad
    src = u - d
    i0 = np.floor(src).astype(int)
    fr = src - i0
    vi = np.arange(H)[:, None]
    left = tex[vi, i0] * (1 - fr) + tex[vi, i0 + 1] * fr
    right = tex[:, pad:pad + W]
    return (np.clip(left, 0, 255).astype(np.uint8),
            np.clip(right, 0, 255).astype(np.uint8),
            d)


def photographic_pair():
    """Real photographic stereo pair: the reference repo's fisheye stereo
    photos (doc/images/{left,right}_fisheye_epipolar.png, 960x600 — real
    camera imagery with saturated gradients, occlusion boundaries and
    natural speckle; the drawn epipolar lines are just extra texture).
    Cropped to 640x480 (bench resolution), grayscaled with ITU-R 601
    rounding. The IMAGES are test inputs only — doc assets, not code."""
    from PIL import Image

    out = []
    for side in ("left", "right"):
        im = Image.open(
            f"/root/reference/doc/images/{side}_fisheye_epipolar.png")
        g = np.asarray(im.convert("L"))[60:540, 160:800]
        out.append(np.ascontiguousarray(g))
    return out


def run_reference(binary, wd, name, left, right, preset):
    H, W = left.shape
    lf = os.path.join(wd, f"{name}_l.raw")
    rf = os.path.join(wd, f"{name}_r.raw")
    left.tofile(lf)
    right.tofile(rf)
    prefix = os.path.join(wd, name)
    subprocess.run(
        [binary, lf, rf, str(W), str(H), preset, prefix], check=True)
    D1 = np.fromfile(f"{prefix}_D1.raw", np.float32).reshape(H, W)
    D2 = np.fromfile(f"{prefix}_D2.raw", np.float32).reshape(H, W)
    return D1, D2


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    rng = np.random.default_rng(42)
    with tempfile.TemporaryDirectory() as wd:
        binary = build_golden_binary(wd)

        left, right = photographic_pair()
        D1, D2 = run_reference(binary, wd, "photo", left, right, "ROBOTICS")
        np.savez_compressed(
            os.path.join(FIXDIR, "elas_golden_photo.npz"),
            left=left, right=right, D1=D1, D2=D2, preset="ROBOTICS")
        print(f"photo: valid={(D1 >= 0).mean():.2%} 640x480 "
              f"-> elas_golden_photo.npz")

        scenes = [
            ("s320_flat", 320, 180, 30.0, "flat", "ROBOTICS"),
            ("s320_boxes", 320, 184, 40.0, "boxes", "ROBOTICS"),
            ("s640_boxes", 640, 480, 50.0, "boxes", "ROBOTICS"),
            ("s320_mb", 320, 184, 35.0, "boxes", "MIDDLEBURY"),
        ]
        for name, W, H, dbase, kind, preset in scenes:
            left, right, dtrue = make_scene(rng, H, W, dbase, kind)
            lf = os.path.join(wd, f"{name}_l.raw")
            rf = os.path.join(wd, f"{name}_r.raw")
            left.tofile(lf)
            right.tofile(rf)
            prefix = os.path.join(wd, name)
            subprocess.run(
                [binary, lf, rf, str(W), str(H), preset, prefix], check=True)
            D1 = np.fromfile(f"{prefix}_D1.raw", np.float32).reshape(H, W)
            D2 = np.fromfile(f"{prefix}_D2.raw", np.float32).reshape(H, W)
            out = os.path.join(FIXDIR, f"elas_golden_{name}.npz")
            np.savez_compressed(
                out, left=left, right=right, d_true=dtrue.astype(np.float32),
                D1=D1, D2=D2, preset=preset)
            valid = D1 >= 0
            err = np.abs(D1[valid] - dtrue[valid])
            print(f"{name}: valid={valid.mean():.2%} "
                  f"golden-vs-true RMSE={np.sqrt((err**2).mean()):.2f}px -> {out}")


if __name__ == "__main__":
    sys.exit(main())
