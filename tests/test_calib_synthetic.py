import numpy as np
import jax.numpy as jnp
import pytest

from direct_stereo_slam_tpu.utils.calib import (
    build_rectified_camera,
    parse_camera_file,
    parse_t_stereo,
)
from direct_stereo_slam_tpu.io.synthetic import (
    SyntheticStereoDataset,
    default_scene,
    kitti_like_intrinsics,
    render,
)

pytestmark = pytest.mark.smoke


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_parse_kitti_style_pinhole(tmp_path):
    path = _write(
        tmp_path,
        "camera0.txt",
        "Pinhole 718.8560 718.8560 607.1928 185.2157 0\n1241 376\ncrop\n1232 368\n",
    )
    model, mode, (ow, oh) = parse_camera_file(path)
    assert model.kind == "pinhole"
    assert model.fx == 718.856
    assert (ow, oh) == (1232, 368)
    cam = build_rectified_camera(path)
    assert cam.w == 1232 and cam.h == 368
    # pinhole 'crop' scales K by output/input ratio
    assert np.isclose(cam.fx, 718.856 * 1232 / 1241, rtol=1e-6)


def test_parse_relative_intrinsics(tmp_path):
    path = _write(
        tmp_path,
        "cam.txt",
        "0.5 0.9 0.5 0.5 0.0\n800 600\nfull\n800 600\n",
    )
    model, _, _ = parse_camera_file(path)
    assert model.kind == "fov"
    assert model.fx == 0.5 * 800
    assert model.cx == 0.5 * 800 - 0.5


def test_parse_t_stereo(tmp_path):
    path = _write(
        tmp_path,
        "T_stereo.yaml",
        "T_stereo:\n  cols: 4\n  rows: 4\n  data: [1, 0, 0, -0.5372,\n"
        "         0, 1, 0, 0,\n         0, 0, 1, 0.000000001,\n"
        "         0, 0, 0, 1]\n",
    )
    T = parse_t_stereo(path)
    assert T.shape == (4, 4)
    assert np.isclose(T[0, 3], -0.5372)
    assert np.isclose(T[2, 3], 1e-9)


def test_synthetic_render_photoconsistency():
    """A world point visible from two poses must have the same intensity."""
    scene = default_scene()
    K = jnp.asarray(kitti_like_intrinsics(160, 96))
    T0 = jnp.eye(4)
    T1 = jnp.eye(4).at[2, 3].set(0.5)  # move 0.5 m forward
    img0, depth0 = render(scene, T0, K, 160, 96)
    img1, _ = render(scene, T1, K, 160, 96)

    # take a central pixel, backproject with exact depth, reproject into view 1
    v, u = 70, 80
    z = float(depth0[v, u])
    fx, fy, cx, cy = float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2])
    p_cam = np.array([(u - cx) / fx * z, (v - cy) / fy * z, z])
    p_cam1 = p_cam - np.array([0.0, 0.0, 0.5])
    u1 = fx * p_cam1[0] / p_cam1[2] + cx
    v1 = fy * p_cam1[1] / p_cam1[2] + cy
    i0 = float(img0[v, u])
    # bilinear sample img1
    x0, y0 = int(u1), int(v1)
    fxw, fyw = u1 - x0, v1 - y0
    i1 = (
        float(img1[y0, x0]) * (1 - fxw) * (1 - fyw)
        + float(img1[y0, x0 + 1]) * fxw * (1 - fyw)
        + float(img1[y0 + 1, x0]) * (1 - fxw) * fyw
        + float(img1[y0 + 1, x0 + 1]) * fxw * fyw
    )
    assert abs(i0 - i1) < 3.0  # bilinear + texture curvature tolerance


def test_synthetic_stereo_dataset():
    ds = SyntheticStereoDataset(n_frames=3, width=128, height=64)
    f = ds.frame(0)
    assert f["img0"].shape == (64, 128)
    assert f["img1"].shape == (64, 128)
    assert float(f["depth0"].min()) > 0.1
    # stereo pair differs (baseline shift) but statistics are similar
    assert float(jnp.mean(jnp.abs(f["img0"] - f["img1"]))) > 0.1


def test_parse_vignette(tmp_path):
    import numpy as np
    from direct_stereo_slam_tpu.utils.calib import parse_vignette
    try:
        import cv2
    except ImportError:
        import pytest
        pytest.skip("no cv2")
    v = (np.ones((40, 60)) * 60000).astype(np.uint16)
    v[:, :10] = 30000  # dimmed edge
    p = str(tmp_path / "vig.png")
    cv2.imwrite(p, v)
    out = parse_vignette(p)
    assert out.shape == (40, 60)
    assert abs(out.max() - 1.0) < 1e-6
    assert abs(out[0, 0] - 0.5) < 0.01
    out2 = parse_vignette(p, out_w=30, out_h=20)
    assert out2.shape == (20, 30)


def test_photometric_undistort_applies_gamma_and_vignette(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.io.undistort import Undistorter
    from direct_stereo_slam_tpu.utils.calib import RectifiedCamera

    cam = RectifiedCamera(100.0, 100.0, 19.5, 14.5, 40, 30, None, None)
    binv = np.linspace(0, 255, 256).astype(np.float32) ** 1.2 / (255 ** 0.2)
    vig = np.ones((30, 40), np.float32)
    vig[:, :20] = 0.5
    und = Undistorter(cam, binv=binv, vignette=vig)
    raw = np.full((30, 40), 100, np.uint8)
    out = np.asarray(und(raw))
    # right half: gamma only; left half: gamma / 0.5
    assert abs(out[15, 30] - binv[100]) < 1e-3
    assert abs(out[15, 5] - binv[100] * 2.0) < 1e-2
