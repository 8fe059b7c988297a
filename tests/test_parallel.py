"""Multi-device sharded batch step + graft entry points (8 virtual CPUs)."""

import sys
import os

import numpy as np


def test_dryrun_multichip_8():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    T = np.asarray(out[0])
    assert T.shape == (4, 4)
    assert np.isfinite(T).all()


def test_folded_batch_matches_per_lane_tracker():
    """make_batched_step's folded-gather form must reproduce the plain
    single-sequence tracker: bilinear_take_frames(lane-folded) and
    bilinear_take_channels are arithmetically identical; the residual
    last-ulp differences come from vmap's batched-matmul lowering (the
    prior plain-vmap form had the same property), so compare to tight
    tolerance rather than bitwise."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from direct_stereo_slam_tpu.config import make_config
    from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
    from direct_stereo_slam_tpu.models.depth_template import TrackerTemplate
    from direct_stereo_slam_tpu.models.tracker import AffLight, track_candidate
    from direct_stereo_slam_tpu.ops.pyramid import build_pyramid
    from direct_stereo_slam_tpu.parallel.mesh import make_batched_step

    W, H, levels, B = 64, 32, 2, 3
    cfg = make_config(W, H)
    cfg = cfg.replace(tracker=cfg.tracker.__class__(
        pyr_levels=levels, max_iterations=(4, 4)))
    intr = make_pyramid_intrinsics(40.0, 40.0, W / 2 - 0.5, H / 2 - 0.5,
                                   W, H, levels)
    rng = np.random.RandomState(3)
    img0 = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 255)
    img1 = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 255)
    budgets = (96, 96)
    tmpl = TrackerTemplate(
        pu=tuple(jnp.asarray(rng.uniform(3, (W >> l) - 4, (B, budgets[l])).astype(np.float32)) for l in range(levels)),
        pv=tuple(jnp.asarray(rng.uniform(3, (H >> l) - 4, (B, budgets[l])).astype(np.float32)) for l in range(levels)),
        pid=tuple(jnp.asarray(rng.uniform(0.1, 1.0, (B, budgets[l])).astype(np.float32)) for l in range(levels)),
        pcolor=tuple(jnp.asarray(rng.uniform(0, 255, (B, budgets[l])).astype(np.float32)) for l in range(levels)),
        pmask=tuple(jnp.ones((B, budgets[l]), bool) for l in range(levels)),
    )
    T_init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    step = make_batched_step(intr, cfg, levels)
    out = step(img0, img1, tmpl, T_init)

    zero = AffLight(jnp.float32(0.0), jnp.float32(0.0))
    one = jnp.float32(1.0)
    for b in range(B):
        pyr = build_pyramid(img0[b], levels)
        tm = jax.tree_util.tree_map(lambda x: x[b], tmpl)
        tr = track_candidate(tuple(pyr.data), tm, intr, cfg,
                             T_init[b], zero, zero, one, one)
        np.testing.assert_allclose(np.asarray(out.T[b]), np.asarray(tr.T),
                                    rtol=2e-4, atol=2e-4,
                                    err_msg=f"lane {b} pose")
        np.testing.assert_allclose(np.asarray(out.res[b]),
                                   np.asarray(tr.res_per_level[0]),
                                   rtol=2e-3, err_msg=f"lane {b} res")
