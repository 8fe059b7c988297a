"""Tracker + depth-template integration tests on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry import lie
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.models.depth_template import (
    build_template,
    default_budgets,
    scale_template_idepth,
)
from direct_stereo_slam_tpu.models.tracker import (
    AffLight,
    make_motion_tries,
    select_winner,
    track_candidates_batch,
)
from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

W, H, LVLS = 320, 96, 4


def make_setup(speed=0.3, n_frames=3):
    ds = SyntheticStereoDataset(n_frames=n_frames, width=W, height=H, speed=speed)
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], W, H, LVLS)
    cfg = make_config(W, H, preset=0, mode=1)
    return ds, intr, cfg


def template_from_depth(frame, budgets, n=2000, seed=0):
    """Build a tracker template from ground-truth depth at random pixels
    (stands in for the BA window's projected points)."""
    rng = np.random.RandomState(seed)
    us = rng.uniform(3, W - 4, n).astype(np.float32)
    vs = rng.uniform(3, H - 4, n).astype(np.float32)
    depth = np.asarray(frame["depth0"])[vs.astype(int), us.astype(int)]
    pid = (1.0 / depth).astype(np.float32)
    return build_template(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(pid),
        jnp.ones(n, jnp.float32), frame["img0"], LVLS, budgets,
    )


class TestTemplate:
    def test_template_masks_and_values(self):
        ds, intr, cfg = make_setup()
        f0 = ds.frame(0)
        budgets = default_budgets(W, H, LVLS)
        tmpl = template_from_depth(f0, budgets)
        assert tmpl.levels == LVLS
        n0 = int(jnp.sum(tmpl.pmask[0]))
        assert n0 > 1500  # most scatter targets survive
        # idepths positive and sane
        pid0 = np.asarray(tmpl.pid[0])[np.asarray(tmpl.pmask[0])]
        assert (pid0 > 0).all() and (pid0 < 5).all()
        # colors match the image at those pixels
        pu = np.asarray(tmpl.pu[0])[np.asarray(tmpl.pmask[0])].astype(int)
        pv = np.asarray(tmpl.pv[0])[np.asarray(tmpl.pmask[0])].astype(int)
        img = np.asarray(f0["img0"])
        col = np.asarray(tmpl.pcolor[0])[np.asarray(tmpl.pmask[0])]
        np.testing.assert_allclose(col, img[pv, pu], atol=1e-3)

    def test_scale_template(self):
        ds, intr, cfg = make_setup()
        tmpl = template_from_depth(ds.frame(0), default_budgets(W, H, LVLS))
        t2 = scale_template_idepth(tmpl, jnp.float32(2.0))
        np.testing.assert_allclose(
            np.asarray(t2.pid[0]), np.asarray(tmpl.pid[0]) / 2.0, rtol=1e-6
        )

    def test_template_dilation_fills_holes(self):
        """A sparse template at coarse levels gets denser via pooling+dilation."""
        ds, intr, cfg = make_setup()
        budgets = default_budgets(W, H, LVLS)
        tmpl = template_from_depth(ds.frame(0), budgets, n=300)
        n3 = int(jnp.sum(tmpl.pmask[3]))
        assert n3 > 250  # 300 points pooled into 40x12 level mostly covered


class TestTracker:
    def test_tracks_known_motion(self):
        ds, intr, cfg = make_setup(speed=0.35)
        f0, f1 = ds.frame(0), ds.frame(1)
        budgets = default_budgets(W, H, LVLS)
        tmpl = template_from_depth(f0, budgets)
        pyr1 = build_pyramid(f1["img0"], LVLS)

        T_gt = np.linalg.inv(f1["pose_w_c0"]) @ f0["pose_w_c0"]

        # batch: identity + small wrong guesses; tracker must converge
        T_inits = jnp.stack([
            jnp.eye(4),
            jnp.asarray(lie.se3_exp(jnp.array([0.05, 0, -0.2, 0, 0.01, 0]))),
        ])
        zero = AffLight(jnp.float32(0.0), jnp.float32(0.0))
        one = jnp.float32(1.0)
        res = track_candidates_batch(
            tuple(pyr1.data), tmpl, intr, cfg, T_inits, zero, zero, one, one
        )
        assert res.T.shape == (2, 4, 4)
        assert bool(res.ok[0])
        err = np.asarray(
            lie.se3_log(jnp.asarray(np.linalg.inv(T_gt), dtype=jnp.float32) @ res.T[0])
        )
        assert np.linalg.norm(err) < 0.01, err
        # residual should be small (subpixel alignment on clean synthetic)
        assert float(res.res_per_level[0, 0]) < 12.0

    def test_winner_selection(self):
        ds, intr, cfg = make_setup(speed=0.3)
        f0, f1 = ds.frame(0), ds.frame(1)
        budgets = default_budgets(W, H, LVLS)
        tmpl = template_from_depth(f0, budgets)
        pyr1 = build_pyramid(f1["img0"], LVLS)
        T_inits = jnp.stack([jnp.eye(4)] * 3)
        zero = AffLight(jnp.float32(0.0), jnp.float32(0.0))
        one = jnp.float32(1.0)
        res = track_candidates_batch(
            tuple(pyr1.data), tmpl, intr, cfg, T_inits, zero, zero, one, one
        )
        idx, good = select_winner(res, last_rmse=1e9, cfg=cfg)
        assert good and idx == 0  # first candidate wins when all equal

    def test_motion_tries_shapes(self):
        _, _, cfg = make_setup()
        I = np.eye(4)
        s1, s2 = make_motion_tries(I, I, I, cfg)
        assert s1.shape == (5, 4, 4)
        assert s2.shape == (78, 4, 4)
        # all are valid rigid transforms
        for T in s2[:5]:
            R = T[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
