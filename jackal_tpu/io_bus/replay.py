"""Frame sources: NPZ/image-directory replay and synthetic generation.

Stands in for the reference's camera topics (uvc_stereo_node at 640x360
@60fps, launch/stereo.launch) for offline/benchmark runs — the fixture-based
replay harness SURVEY §4 calls for. JPEG topics are decoded with cv2 when
available (the reference wire format, point_cloud.cpp:436), else PNG/PGM
and raw arrays.
"""
from __future__ import annotations

import glob
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from .pgm import load_pgm


def _imread_gray(path: str) -> np.ndarray:
    if path.endswith(".pgm"):
        return load_pgm(path)
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise ValueError(f"cannot read {path}")
        return img
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("L"))


def _imread_bgr(path: str) -> np.ndarray:
    """Color read in OpenCV BGR channel order (like leftim_res,
    point_cloud.cpp:356-383). PGM has no color: replicate gray."""
    if path.endswith(".pgm"):
        g = load_pgm(path)
        return np.repeat(g[..., None], 3, axis=-1)
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"cannot read {path}")
        return img
    except ImportError:
        from PIL import Image
        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[..., ::-1].copy()


def decode_jpeg_gray(data: bytes) -> Optional[np.ndarray]:
    """cv::imdecode(..., GRAYSCALE) equivalent (point_cloud.cpp:436).
    Returns None on decode failure, like the reference's empty-Mat check.
    cv2 when present; PIL otherwise (this image ships PIL, not cv2)."""
    try:
        import cv2
        arr = np.frombuffer(data, np.uint8)
        return cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
    except ImportError:
        pass
    except Exception:
        return None
    try:
        import io
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    except Exception:
        return None


def decode_jpeg_bgr(data: bytes) -> Optional[np.ndarray]:
    """cv::imdecode(..., COLOR) equivalent: [H, W, 3] uint8 BGR."""
    try:
        import cv2
        arr = np.frombuffer(data, np.uint8)
        return cv2.imdecode(arr, cv2.IMREAD_COLOR)
    except ImportError:
        pass
    except Exception:
        return None
    try:
        import io
        from PIL import Image
        rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return rgb[..., ::-1].copy()
    except Exception:
        return None


class StereoReplaySource:
    """Iterates (left, right) uint8 frame pairs from an NPZ file or a
    directory of left*/right* images; with want_color, yields
    (left, right, color_bgr) triples — the left COLOR frame feeds the
    gen-pcl cloud's packed-RGB channel (point_cloud.cpp:356-383). NPZ
    sources use a bundled 'color' array when present, else replicate the
    left gray frame."""

    def __init__(self, path: str, loop: bool = False,
                 want_color: bool = False):
        self.loop = loop
        self.want_color = want_color
        self.pairs = []
        if path.endswith(".npz"):
            z = np.load(path)
            if "left" not in z or "right" not in z:
                raise ValueError(
                    f"{path} is not a stereo NPZ (needs 'left' and 'right' "
                    f"arrays; has {sorted(z.files)})")
            left, right = z["left"], z["right"]
            color = z["color"] if "color" in z else None
            if left.ndim == 2:
                cols = [color]
                left, right = left[None], right[None]
            else:
                cols = (color if color is not None
                        else [None] * len(left))
            for i in range(len(left)):
                c = cols[i]
                if want_color and c is None:
                    c = np.repeat(left[i][..., None], 3, axis=-1)
                self.pairs.append(
                    (left[i], right[i], c) if want_color
                    else (left[i], right[i]))
        elif os.path.isdir(path):
            lefts = sorted(glob.glob(os.path.join(path, "left*")))
            for lf in lefts:
                rf = lf.replace("left", "right")
                if os.path.exists(rf):
                    if want_color:
                        self.pairs.append((_imread_gray(lf),
                                           _imread_gray(rf),
                                           _imread_bgr(lf)))
                    else:
                        self.pairs.append(
                            (_imread_gray(lf), _imread_gray(rf)))
        else:
            raise ValueError(f"unsupported replay source: {path}")
        if not self.pairs:
            raise ValueError(f"no stereo pairs found in {path}")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        while True:
            for p in self.pairs:
                yield p
            if not self.loop:
                return

    def __len__(self):
        return len(self.pairs)


def synthetic_stream(
    n_frames: int, height: int = 360, width: int = 640,
    d_base: float = 30.0, seed: int = 0, want_color: bool = False,
) -> Iterator[Tuple[np.ndarray, ...]]:
    """Deterministic synthetic stereo stream (bench/test input). The
    synthetic scene is grayscale; want_color replicates the left frame
    into BGR so the gen-pcl RGB packing path is exercised end to end."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tools"))
    rng = np.random.default_rng(seed)
    from make_golden_fixtures import make_scene  # noqa: E402
    for i in range(n_frames):
        left, right, _ = make_scene(rng, height, width, d_base, "boxes")
        if want_color:
            yield left, right, np.repeat(left[..., None], 3, axis=-1)
        else:
            yield left, right
