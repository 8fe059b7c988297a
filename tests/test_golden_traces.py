"""Golden-trace regression: the full pipeline's trajectory on a fixed
synthetic sequence must match a checked-in fixture.

This is the stand-in for BASELINE.md's KITTI protocol in an environment
with no dataset (VERDICT r1 item 4): accuracy drift in ANY stage (tracker,
BA, scale opt, marginalization, loop handler) shows up as a trajectory
diff long before an ATE harness could notice. Regenerate deliberately with

    DSSLAM_REGEN_GOLDEN=1 python -m pytest tests/test_golden_traces.py -q

after a change that intentionally alters numerics, and commit the diff.

Tolerance: 2e-3 m. Same-platform reruns are bit-identical; the tolerance
absorbs cross-jax-version fusion differences while still catching real
policy/numerics regressions (which move keyframe positions by cm+)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.loop.handler import LoopHandler
from direct_stereo_slam_tpu.runtime.node import SLAMNode

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_smoke.npz")
# same shapes as test_smoke_e2e so the two tests share every compiled
# program (the golden run then costs steps, not compiles)
W, H, LVLS = 96, 48, 3


def _run():
    ds = SyntheticStereoDataset(n_frames=20, width=W, height=H, speed=0.2)
    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=LVLS,
                                      max_iterations=(10, 20, 20)),
        ba=cfg.ba.__class__(max_frames=4, min_frames=3,
                            max_points_per_frame=64,
                            max_immature_per_frame=128,
                            desired_point_density=150.0,
                            desired_immature_density=100.0),
    )
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, LVLS)
    handler = LoopHandler(cfg, intr, threaded=False)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0, loop_handler=handler)
    frame_pos = []
    for i in range(len(ds)):
        f = ds.frame(i)
        sh = node.process(f["img0"], f["img1"], timestamp=float(i) * 0.1)
        frame_pos.append(np.asarray(sh.T_wc)[:3, 3])
    node.finish()
    rows = handler.odometry_rows()
    kf_rows = np.asarray([[r[0], r[1], r[2], r[3]] for r in rows],
                         np.float64) if rows else np.zeros((0, 4))
    return np.stack(frame_pos), kf_rows


def test_golden_trajectory():
    frame_pos, kf_rows = _run()
    if os.environ.get("DSSLAM_REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, frame_pos=frame_pos, kf_rows=kf_rows)
        pytest.skip("regenerated golden fixture")
    assert os.path.exists(FIXTURE), (
        "golden fixture missing; run with DSSLAM_REGEN_GOLDEN=1")
    g = np.load(FIXTURE)
    assert frame_pos.shape == g["frame_pos"].shape, (
        f"frame count changed: {frame_pos.shape} vs {g['frame_pos'].shape}")
    np.testing.assert_allclose(frame_pos, g["frame_pos"], atol=2e-3,
                               err_msg="per-frame tracked positions drifted")
    assert kf_rows.shape == g["kf_rows"].shape, (
        f"keyframe trajectory shape changed: {kf_rows.shape} vs "
        f"{g['kf_rows'].shape}")
    if len(kf_rows):
        np.testing.assert_array_equal(kf_rows[:, 0], g["kf_rows"][:, 0],
                                      err_msg="keyframe cadence changed")
        np.testing.assert_allclose(kf_rows[:, 1:], g["kf_rows"][:, 1:],
                                   atol=2e-3,
                                   err_msg="marginalized KF positions drifted")
