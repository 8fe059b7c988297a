"""Generate the checked-in real-format ingestion fixtures.

These are the file formats the reference pipeline consumes from disk
(DSO camera.txt + pcalib.txt + vignette.png, reference main.cpp:146-158;
PGM images via the image reader; KITTI odometry folder layout for the
primary benchmarks, BASELINE configs 1/3/5) — rendered from an ANALYTIC
irradiance pattern with a known RadTan distortion, radial vignette and
gamma response applied forward, so the ingestion test can verify the
whole decode -> photometric undistort -> geometric remap chain against
closed-form ground truth rather than golden images.

Run from the repo root to regenerate:  python tests/fixtures/realformat/gen_fixtures.py
All outputs are deterministic (no RNG).
"""

import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

# raw (distorted) input geometry
IN_W, IN_H = 320, 240
OUT_W, OUT_H = 288, 208
FX, FY, CX, CY = 280.0, 280.0, 159.5, 119.5
K1, K2, P1, P2 = -0.28, 0.07, 2e-4, -1e-4   # TUM-ish RadTan
GAMMA = 1.8                                  # Binv[i] = 255*(i/255)^GAMMA


def pattern(xn, yn, phase=0.0):
    """Smooth analytic irradiance in normalized-ray coordinates, range
    comfortably inside [20, 235] so the gamma LUT is exercised away from
    its clipped ends."""
    return 127.0 + 80.0 * np.sin(3.0 * xn + phase) * np.cos(2.0 * yn)


def distort(xn, yn):
    r2 = xn * xn + yn * yn
    rad = 1.0 + K1 * r2 + K2 * r2 * r2
    xd = xn * rad + 2.0 * P1 * xn * yn + P2 * (r2 + 2.0 * xn * xn)
    yd = yn * rad + P1 * (r2 + 2.0 * yn * yn) + 2.0 * P2 * xn * yn
    return xd, yd


def undistort_fixed_point(xd, yd, iters=30):
    xn, yn = xd.copy(), yd.copy()
    for _ in range(iters):
        xdd, ydd = distort(xn, yn)
        xn += xd - xdd
        yn += yd - ydd
    return xn, yn


def vignette(uu, vv):
    """Radial falloff, min ~0.55 at the raw corners (max == 1 at center,
    matching parse_vignette's max-normalization)."""
    rx = (uu - CX) / (IN_W / 2.0)
    ry = (vv - CY) / (IN_H / 2.0)
    r2 = rx * rx + ry * ry
    return 1.0 - 0.25 * r2


def binv_table():
    i = np.arange(256, dtype=np.float64)
    return 255.0 * (i / 255.0) ** GAMMA


def apply_response(E):
    """Forward response B = Binv^-1: irradiance -> pixel value."""
    return 255.0 * np.clip(E / 255.0, 0.0, 1.0) ** (1.0 / GAMMA)


def write_pgm(path, img8):
    with open(path, "wb") as f:
        f.write(b"P5\n# realformat fixture\n%d %d\n255\n"
                % (img8.shape[1], img8.shape[0]))
        f.write(img8.astype(np.uint8).tobytes())


def write_png16(path, img01):
    import cv2
    cv2.imwrite(path, (np.clip(img01, 0.0, 1.0) * 65535.0).astype(np.uint16))


def render_raw(phase):
    """Raw distorted camera image of the analytic pattern with vignette +
    response applied — what a real (uncalibrated) sensor would record."""
    uu, vv = np.meshgrid(np.arange(IN_W, dtype=np.float64),
                         np.arange(IN_H, dtype=np.float64))
    xd = (uu - CX) / FX
    yd = (vv - CY) / FY
    xn, yn = undistort_fixed_point(xd, yd)
    E = pattern(xn, yn, phase) * vignette(uu, vv)
    return np.round(apply_response(E)).astype(np.uint8)


def main():
    os.makedirs(os.path.join(HERE, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(HERE, "image_1"), exist_ok=True)

    # DSO-format calibration stack
    with open(os.path.join(HERE, "camera.txt"), "w") as f:
        f.write("RadTan %g %g %g %g %g %g %g %g\n" %
                (FX, FY, CX, CY, K1, K2, P1, P2))
        f.write("%d %d\ncrop\n%d %d\n" % (IN_W, IN_H, OUT_W, OUT_H))
    with open(os.path.join(HERE, "pcalib.txt"), "w") as f:
        f.write(" ".join("%.6f" % v for v in binv_table()) + "\n")
    uu, vv = np.meshgrid(np.arange(IN_W, dtype=np.float64),
                         np.arange(IN_H, dtype=np.float64))
    write_png16(os.path.join(HERE, "vignette.png"), vignette(uu, vv))
    with open(os.path.join(HERE, "T_stereo.yaml"), "w") as f:
        f.write("T_stereo: !!opencv-matrix\n  rows: 4\n  cols: 4\n"
                "  dt: d\n  data: [ 1., 0., 0., -0.12,\n"
                "          0., 1., 0., 0.,\n"
                "          0., 0., 1., 1.e-9,\n"
                "          0., 0., 0., 1. ]\n")
    # TUM-monoVO times.txt: "id time exposure(ms)"; frame 1 has exposure 0
    # (unrecorded) to exercise the reader's neighbor interpolation
    with open(os.path.join(HERE, "times.txt"), "w") as f:
        f.write("00000 1300000000.10 10.0\n"
                "00001 1300000000.20 0\n"
                "00002 1300000000.30 14.0\n")

    for i, phase in enumerate((0.0, 0.35, 0.7)):
        raw0 = render_raw(phase)
        raw1 = render_raw(phase + 0.05)
        write_pgm(os.path.join(HERE, "image_0", "%05d.pgm" % i), raw0)
        write_pgm(os.path.join(HERE, "image_1", "%05d.pgm" % i), raw1)

    # KITTI odometry mini-sequence (PNG, calib.txt with P0/P1, times.txt)
    seq = os.path.join(HERE, "kitti", "sequences", "00")
    os.makedirs(os.path.join(seq, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_1"), exist_ok=True)
    import cv2
    for i, phase in enumerate((0.0, 0.4)):
        raw = render_raw(phase)   # distortion-free content irrelevant here
        cv2.imwrite(os.path.join(seq, "image_0", "%06d.png" % i), raw)
        cv2.imwrite(os.path.join(seq, "image_1", "%06d.png" % i), raw)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        p0 = "7.188560e+02 0 6.071928e+02 0 0 7.188560e+02 1.852157e+02 0 0 0 1 0"
        # P1 x-offset = -fx * baseline, baseline 0.5372 m (KITTI 00)
        p1 = ("7.188560e+02 0 6.071928e+02 -3.861448e+02 "
              "0 7.188560e+02 1.852157e+02 0 0 0 1 0")
        f.write("P0: %s\nP1: %s\n" % (p0, p1))
    with open(os.path.join(seq, "times.txt"), "w") as f:
        f.write("0.000000e+00\n1.038000e-01\n")


if __name__ == "__main__":
    main()
