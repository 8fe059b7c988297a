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
