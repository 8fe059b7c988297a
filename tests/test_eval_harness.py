"""Eval harness (runtime/eval.py, the engine behind scripts/eval_kitti.py):
exercise run_sequence + ATE scoring + timing table on a tiny synthetic
sequence so the BASELINE.md comparison path cannot rot between KITTI runs."""

import numpy as np
import pytest

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.runtime.eval import (
    ate_rmse, run_sequence, score_rows, timing_table, trajectory_xyz)

pytestmark = pytest.mark.smoke


def test_ate_rmse_se3_alignment_exact():
    rng = np.random.RandomState(0)
    gt = rng.randn(40, 3)
    # a rigidly transformed copy must align to ~zero ATE
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    est = gt @ R.T + np.array([5.0, -2.0, 1.0])
    assert ate_rmse(est, gt) < 1e-6
    # a corrupted copy must not
    est2 = est + rng.randn(40, 3) * 0.5
    assert ate_rmse(est2, gt) > 0.1


def test_run_sequence_synthetic_and_scoring():
    W, H = 192, 64
    n = 26
    ds = SyntheticStereoDataset(n_frames=n, width=W, height=H, speed=0.3)
    cfg = make_config(W, H)
    import dataclasses
    cfg = cfg.replace(ba=dataclasses.replace(
        cfg.ba, max_frames=4, min_frames=2, max_points_per_frame=64,
        max_immature_per_frame=256, desired_point_density=200.0,
        desired_immature_density=150.0))
    node, handler, secs = run_sequence(
        ds, cfg, ds.K, ds.t_cam1_cam0, levels=3, threaded_loop=False)
    assert node.frontend.initialized
    assert not node.frontend.is_lost
    rows = handler.odometry_rows()
    assert len(rows) >= 3

    gt = ds.poses[:, :3, 3]
    # score against ground truth through the public helpers
    ids, est = trajectory_xyz(rows)
    assert est.shape[1] == 3 and len(ids) == len(est)
    s = score_rows(rows, gt)
    assert s is not None and np.isfinite(s)
    # a coherent odometry run on this easy forward scene scores well under
    # a meter of ATE
    assert s < 1.0, s

    tt = timing_table(node.timers)
    assert "track" in tt and tt["track"][1] > 0


def test_timing_table_stage_names():
    # the table must carry the reference's shutdown-stat names
    # (main.cpp:181-201) when the stages ran
    from direct_stereo_slam_tpu.utils.timing import StageTimers
    t = StageTimers()
    with t.span("track"):
        pass
    with t.span("sc_generation"):
        pass
    tt = timing_table(t)
    assert set(tt) == {"track", "sc_generation"}
