"""Pipelined tracking (frontend._process_pipelined) vs the synchronous
per-frame path: the pipeline hides the per-frame host pull behind the next
frame's dispatch; these tests pin that it does so without changing the
trajectory beyond the documented one-frame-deep deviations (the keyframe
decision for frame N-1 runs with frame N already in flight, so frame N
tracks against the pre-keyframe template; see PARITY.md)."""

import numpy as np
import pytest

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.runtime.node import SLAMNode

W, H, N = 256, 128, 15


import functools


@functools.lru_cache(maxsize=2)
def _run(pipelined: bool):
    import dataclasses

    ds = SyntheticStereoDataset(n_frames=N, width=W, height=H, speed=0.4)
    cfg = make_config(W, H, preset=0, mode=1)
    cfg = dataclasses.replace(
        cfg, runtime=dataclasses.replace(cfg.runtime,
                                         pipelined_tracking=pipelined))
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, cfg.tracker.pyr_levels)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0)
    for i in range(N):
        f = ds.frame(i)
        node.process(f["img0"], f["img1"], float(f["timestamp"]))
    node.finish()
    fe = node.frontend
    poses = np.stack([s.T_wc for s in fe.all_frames])
    kf_ids = [s.incoming_id for s in fe.all_frames if s.is_kf]
    return poses, kf_ids, fe, ds


@pytest.mark.slow
def test_pipelined_matches_sync_trajectory():
    poses_s, kfs_s, _, ds = _run(False)
    poses_p, kfs_p, fe, _ = _run(True)
    # every frame got a completed shell (flush_pipeline drained the tail)
    assert poses_p.shape[0] == N
    # translation ATE between the two modes stays small relative to the
    # distance travelled (one-frame KF lag shifts cadence slightly)
    err = np.linalg.norm(poses_s[:, :3, 3] - poses_p[:, :3, 3], axis=1)
    travelled = np.linalg.norm(poses_s[-1, :3, 3] - poses_s[0, :3, 3])
    assert travelled > 1.0
    assert float(err.mean()) < 0.05 * travelled, (err.mean(), travelled)
    # keyframe cadence stays comparable
    assert abs(len(kfs_s) - len(kfs_p)) <= 2, (kfs_s, kfs_p)
    # ground truth sanity: both modes roughly recover the synthetic motion
    gt = np.asarray(ds.poses[:N])
    gt_err = np.linalg.norm(gt[:, :3, 3] - poses_p[:, :3, 3], axis=1)
    assert float(gt_err.mean()) < 0.10 * travelled, gt_err.mean()


def test_pipelined_flush_on_finish():
    """An in-flight frame must be consumed by node.finish (no placeholder
    poses left in the trajectory)."""
    poses_p, _, fe, _ = _run(True)
    assert fe._pl_inflight is None
    # consecutive placeholder poses would repeat exactly; the consumed
    # trajectory must keep moving on the constant-velocity sequence
    deltas = np.linalg.norm(np.diff(poses_p[2:, :3, 3], axis=0), axis=1)
    assert (deltas > 1e-4).all()


def test_pipelined_serial_policy_bypasses():
    """winner_policy='serial' (the reference-exact A/B mode) must ignore
    the pipelined flag and keep synchronous semantics."""
    import dataclasses

    ds = SyntheticStereoDataset(n_frames=8, width=W, height=H, speed=0.4)
    cfg = make_config(W, H, preset=0, mode=1)
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, pipelined_tracking=True),
        tracker=dataclasses.replace(cfg.tracker, winner_policy="serial"))
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, cfg.tracker.pyr_levels)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0)
    for i in range(8):
        f = ds.frame(i)
        node.process(f["img0"], f["img1"], float(f["timestamp"]))
    assert node.frontend._pl_inflight is None
    node.finish()
