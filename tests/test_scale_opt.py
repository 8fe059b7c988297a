"""Scale optimizer tests: recover a known global scale error from stereo."""

import jax.numpy as jnp
import numpy as np

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.models.depth_template import build_template, default_budgets
from direct_stereo_slam_tpu.models.scale_opt import (
    ScaleState,
    optimize_scale_batch,
    run_scale_optimization,
)
from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

W, H, LVLS = 320, 96, 4


def setup(scale_err=1.6, n=2000):
    """Dataset + template whose idepths are wrong by a factor `scale_err`
    (monocular-arbitrary scale): idepth_template = idepth_true * scale_err.
    The optimizer should find scale ~= scale_err."""
    ds = SyntheticStereoDataset(n_frames=1, width=W, height=H)
    f0 = ds.frame(0)
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], W, H, LVLS)
    cfg = make_config(W, H, preset=0, mode=1)
    rng = np.random.RandomState(1)
    us = rng.uniform(3, W - 4, n).astype(np.float32)
    vs = rng.uniform(3, H - 4, n).astype(np.float32)
    depth = np.asarray(f0["depth0"])[vs.astype(int), us.astype(int)]
    pid_wrong = (scale_err / depth).astype(np.float32)
    tmpl = build_template(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(pid_wrong),
        jnp.ones(n, jnp.float32), f0["img0"], LVLS, default_budgets(W, H, LVLS),
    )
    pyr1 = build_pyramid(f0["img1"], LVLS)
    return ds, f0, intr, cfg, tmpl, pyr1


def test_recovers_scale():
    scale_err = 1.6
    ds, f0, intr, cfg, tmpl, pyr1 = setup(scale_err)
    t10 = jnp.asarray(ds.t_cam1_cam0)
    out = optimize_scale_batch(
        tuple(pyr1.data), tmpl, jnp.asarray([1.0], jnp.float32),
        intr, intr, t10, cfg,
    )
    s = float(out.scale[0])
    # scale s rescales template idepth by 1/s; to match truth s == scale_err
    assert abs(s - scale_err) / scale_err < 0.03, s
    assert float(out.error[0]) < 15.0


def test_grid_search_far_scale():
    """Start far off (x8 error) — grid search must still land close."""
    scale_err = 8.0
    ds, f0, intr, cfg, tmpl, pyr1 = setup(scale_err)
    t10 = jnp.asarray(ds.t_cam1_cam0)
    state = ScaleState()
    ok, s, err, state = run_scale_optimization(
        tuple(pyr1.data), tmpl, intr, intr, t10, cfg, state
    )
    assert ok
    assert state.trapped
    assert abs(s - scale_err) / scale_err < 0.1, s


def test_trap_state_machine():
    ds, f0, intr, cfg, tmpl, pyr1 = setup(1.0)
    t10 = jnp.asarray(ds.t_cam1_cam0)
    state = ScaleState()
    ok, s, err, state = run_scale_optimization(
        tuple(pyr1.data), tmpl, intr, intr, t10, cfg, state
    )
    assert ok and state.trapped
    assert abs(s - 1.0) < 0.05
    # second call (trapped): warm start at 1.0 stays accepted
    ok2, s2, err2, state = run_scale_optimization(
        tuple(pyr1.data), tmpl, intr, intr, t10, cfg, state
    )
    assert ok2 and state.trapped


def test_disabled_mode():
    ds, f0, intr, cfg, tmpl, pyr1 = setup(1.0)
    cfg = cfg.replace(scale_opt=cfg.scale_opt.__class__(accept_thres=-1.0))
    state = ScaleState()
    ok, s, err, state = run_scale_optimization(
        tuple(pyr1.data), tmpl, intr, intr, jnp.asarray(ds.t_cam1_cam0), cfg, state
    )
    assert not ok and err == -1.0
