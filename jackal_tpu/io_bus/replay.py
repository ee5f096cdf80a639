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


class StereoReplaySource:
    """Iterates (left, right) uint8 frame pairs from an NPZ file or a
    directory of left*/right* images."""

    def __init__(self, path: str, loop: bool = False):
        self.loop = loop
        self.pairs = []
        if path.endswith(".npz"):
            z = np.load(path)
            if "left" not in z or "right" not in z:
                raise ValueError(
                    f"{path} is not a stereo NPZ (needs 'left' and 'right' "
                    f"arrays; has {sorted(z.files)})")
            left, right = z["left"], z["right"]
            if left.ndim == 2:
                self.pairs = [(left, right)]
            else:
                self.pairs = [(left[i], right[i]) for i in range(len(left))]
        elif os.path.isdir(path):
            lefts = sorted(glob.glob(os.path.join(path, "left*")))
            for lf in lefts:
                rf = lf.replace("left", "right")
                if os.path.exists(rf):
                    self.pairs.append((_imread_gray(lf), _imread_gray(rf)))
        else:
            raise ValueError(f"unsupported replay source: {path}")
        if not self.pairs:
            raise ValueError(f"no stereo pairs found in {path}")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            for p in self.pairs:
                yield p
            if not self.loop:
                return

    def __len__(self):
        return len(self.pairs)


def synthetic_stream(
    n_frames: int, height: int = 360, width: int = 640,
    d_base: float = 30.0, seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic synthetic stereo stream (bench/test input)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tools"))
    rng = np.random.default_rng(seed)
    from make_golden_fixtures import make_scene  # noqa: E402
    for i in range(n_frames):
        left, right, _ = make_scene(rng, height, width, d_base, "boxes")
        yield left, right
