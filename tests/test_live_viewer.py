"""LiveViewer: hook semantics + HTML/state generation (viz/live.py)."""

import json
import re

import numpy as np
import pytest

from direct_stereo_slam_tpu.viz.live import LiveViewer

pytestmark = pytest.mark.smoke


def _state(path):
    s = open(path).read()
    m = re.search(r"const S = (\{.*?\});\n", s, re.S)
    return json.loads(m.group(1))


def test_live_viewer_roundtrip(tmp_path):
    path = str(tmp_path / "live.html")
    v = LiveViewer(path)
    T = np.eye(4)
    for i in range(5):
        T = T.copy()
        T[0, 3] = 0.5 * i
        v.publish_cam_pose(T)
        v.publish_keyframe(i, T, np.random.RandomState(i).rand(300, 3))
    v.refresh_lidar_data(np.random.rand(50, 3), np.random.rand(40, 3))
    v.write()
    st = _state(path)
    assert len(st["trail"]) == 5
    assert len(st["kfs"]) == 5
    assert len(st["cloud"]) > 0
    assert len(st["scan_cur"]) == 50 and len(st["scan_matched"]) == 40

    # loop closure re-poses stored keyframe clouds (modifyKeyframePoseByKFID)
    before = dict((k[0], k[1:]) for k in st["kfs"])
    T2 = np.eye(4)
    T2[:3, 3] = [100.0, 0.0, 0.0]
    v.modify_keyframe_poses({i: T2 for i in range(5)},
                            loop_pair=(4, 0), n_direct=1, n_icp=0)
    st2 = _state(path)
    after = dict((k[0], k[1:]) for k in st2["kfs"])
    assert all(after[i][0] == 100.0 for i in range(5))
    assert after != before
    assert st2["loops"] == [[4, 0]]
    assert st2["n_direct"] == 1

    # cloud points moved with the poses (camera-frame storage)
    assert max(p[0] for p in st2["cloud"]) > 90.0


def test_debug_dumps_end_to_end(tmp_path):
    """Residual-image, idepth-jet, and window-stitch dumps (viz/debug.py —
    the reference's TAS.cpp:730-734 / :338-449 / FrontEndDebugStuff online
    debug rendering) appear when runtime.debug_dump_dir is set."""
    import dataclasses
    import os

    from direct_stereo_slam_tpu.config import make_config
    from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
    from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
    from direct_stereo_slam_tpu.runtime.node import SLAMNode

    W, H, LVLS = 192, 64, 3
    ds = SyntheticStereoDataset(n_frames=8, width=W, height=H, speed=0.3)
    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=dataclasses.replace(cfg.tracker, pyr_levels=LVLS),
        ba=dataclasses.replace(
            cfg.ba, max_frames=4, min_frames=2, max_points_per_frame=64,
            max_immature_per_frame=256, desired_point_density=200.0,
            desired_immature_density=150.0),
        runtime=dataclasses.replace(
            cfg.runtime, debug_dump_dir=str(tmp_path / "dbg")),
    )
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, LVLS)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0)
    for f in ds:
        node.process(f["img0"], f["img1"], f["timestamp"])
    files = os.listdir(tmp_path / "dbg")
    assert any(f.endswith("_idepth.png") for f in files)
    assert any(f.endswith("_window.png") for f in files)
    assert any(f.endswith("_residual.png") for f in files)
