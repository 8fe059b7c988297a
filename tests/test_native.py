"""Native C++ runtime library tests (PNM decode, fused undistort, frame queue)."""

import os

import numpy as np
import pytest

try:
    from direct_stereo_slam_tpu.io import native
    native._lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


def write_pgm(path, img):
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n# test comment\n{w} {h}\n255\n".encode())
        f.write(img.astype(np.uint8).tobytes())


def test_pnm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64), np.uint8)
    p = str(tmp_path / "a.pgm")
    write_pgm(p, img)
    out = native.read_pnm(p)
    np.testing.assert_array_equal(out, img)


def test_undistort_matches_python(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (40, 60), np.uint8)
    # random smooth remap within bounds
    ys, xs = np.mgrid[0:32, 0:48].astype(np.float32)
    map_x = xs * 1.2 + 1.5
    map_y = ys * 1.1 + 2.0
    lut = (np.arange(256, dtype=np.float32) * 0.9 + 3.0)

    out = native.undistort(img, map_x, map_y, lut=lut, n_threads=2)

    # python reference
    ref = np.zeros_like(out)
    lut_img = lut[img]
    for v in range(32):
        for u in range(48):
            sx, sy = map_x[v, u], map_y[v, u]
            ix, iy = int(sx), int(sy)
            ix = min(ix, 58)
            iy = min(iy, 38)
            fx, fy = sx - ix, sy - iy
            ref[v, u] = (
                lut_img[iy, ix] * (1 - fx) * (1 - fy)
                + lut_img[iy, ix + 1] * fx * (1 - fy)
                + lut_img[iy + 1, ix] * (1 - fx) * fy
                + lut_img[iy + 1, ix + 1] * fx * fy
            )
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_invalid_map_marks_zero():
    img = np.full((16, 16), 100, np.uint8)
    map_x = np.full((8, 8), -1.0, np.float32)
    map_y = np.full((8, 8), -1.0, np.float32)
    out = native.undistort(img, map_x, map_y)
    assert (out == 0).all()


def test_stereo_loader_queue(tmp_path):
    rng = np.random.RandomState(2)
    files0, files1, stamps = [], [], []
    n = 6
    for i in range(n):
        a = rng.randint(0, 256, (32, 40), np.uint8)
        b = rng.randint(0, 256, (32, 40), np.uint8)
        p0 = str(tmp_path / f"l_{i}.pgm")
        p1 = str(tmp_path / f"r_{i}.pgm")
        write_pgm(p0, a)
        write_pgm(p1, b)
        files0.append(p0)
        files1.append(p1)
        stamps.append(0.1 * i)

    loader = native.NativeStereoLoader(
        files0, files1, stamps, in_size=(40, 32), out_size=(40, 32),
        capacity=3, n_threads=2)
    frames = list(loader)
    loader.close()
    assert len(frames) == n
    assert frames[0]["incoming_id"] == 0
    assert frames[-1]["timestamp"] == pytest.approx(0.5)
    # identity maps: float image equals raw pixels
    raw0 = native.read_pnm(files0[0]).astype(np.float32)
    np.testing.assert_allclose(frames[0]["img0"], raw0, atol=1e-3)
