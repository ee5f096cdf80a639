"""Camera-source abstraction: V4L2 UAPI layout checks + source dispatch.

No cameras exist in CI, so the live path is validated structurally: the
videodev2 ioctl request numbers encode the struct size, so comparing them
against the kernel's documented 64-bit values proves our ctypes layouts
are byte-exact (a wrong layout would corrupt every ioctl)."""
import numpy as np
import pytest

from jackal_tpu.io_bus import camera as cam


def test_ioctl_numbers_match_kernel_uapi():
    # documented 64-bit videodev2.h values
    assert cam.VIDIOC_S_FMT == 0xC0D05605
    assert cam.VIDIOC_REQBUFS == 0xC0145608
    assert cam.VIDIOC_QUERYBUF == 0xC0585609
    assert cam.VIDIOC_QBUF == 0xC058560F
    assert cam.VIDIOC_DQBUF == 0xC0585611
    assert cam.VIDIOC_STREAMON == 0x40045612
    assert cam.VIDIOC_STREAMOFF == 0x40045613
    assert cam.VIDIOC_S_PARM == 0xC0CC5616


def test_fourcc():
    assert cam.PIXFMT_YUYV == 0x56595559
    assert cam.PIXFMT_MJPG == 0x47504A4D


def test_parse_v4l2_spec():
    dl, dr, o = cam.parse_v4l2_spec("v4l2:/dev/video1,/dev/video2")
    assert (dl, dr) == ("/dev/video1", "/dev/video2")
    assert o == {"width": 640, "height": 360, "fps": 60, "pixfmt": "YUYV"}
    dl, dr, o = cam.parse_v4l2_spec(
        "v4l2:/dev/video0,/dev/video4?1280x720@30,MJPG")
    assert o == {"width": 1280, "height": 720, "fps": 30, "pixfmt": "MJPG"}
    with pytest.raises(ValueError):
        cam.parse_v4l2_spec("v4l2:/dev/video1")


def test_open_source_dispatch(tmp_path):
    # synthetic
    it = cam.open_source("synthetic:2")
    frames = list(it)
    assert len(frames) == 2 and frames[0][0].shape == (360, 640)
    # npz replay
    l = (np.arange(64, dtype=np.uint8).reshape(8, 8),)
    np.savez(tmp_path / "s.npz", left=l[0], right=l[0])
    src = cam.open_source(str(tmp_path / "s.npz"))
    pairs = list(src)
    assert len(pairs) == 1
    # live device path raises cleanly when absent
    with pytest.raises(Exception):
        cam.open_source("v4l2:/dev/nonexistent0,/dev/nonexistent1")


def test_yuyv_decode_extracts_y_plane():
    class FakeCam:
        width, height, pixfmt = 4, 2, "YUYV"
    y = np.arange(8, dtype=np.uint8)
    uv = np.full(8, 128, np.uint8)
    raw = np.stack([y, uv], -1).tobytes()
    out = cam.V4L2Camera._decode(FakeCam(), raw)
    assert np.array_equal(out, y.reshape(2, 4))


def test_mjpeg_decode_via_pil():
    from PIL import Image
    import io
    img = (np.random.default_rng(0).random((16, 16)) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=95)

    class FakeCam:
        width, height, pixfmt = 16, 16, "MJPG"
    out = cam.V4L2Camera._decode(FakeCam(), b.getvalue())
    assert out is not None and out.shape == (16, 16)
    assert float(np.mean(np.abs(out.astype(int) - img.astype(int)))) < 8.0
