"""LoopHandler integration: drifted keyframe stream around a closed loop ->
place recognition -> direct/ICP pose estimation -> pose-graph correction."""

import numpy as np
import jax.numpy as jnp

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry import lie
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import (
    SyntheticScene,
    default_scene,
    kitti_like_intrinsics,
    loop_trajectory,
    render,
)
from direct_stereo_slam_tpu.loop.handler import LoopHandler
from direct_stereo_slam_tpu.models.frontend import MarginalizedKF
from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

W, H, LVLS = 256, 80, 4
N_KF = 39   # 1.5 laps: frames 26.. revisit 0..13 with warm scan clouds


def make_loop_stream(drift_per_step=0.012, seed=0):
    """Render keyframes around a closed circle; poses handed to the handler
    accumulate odometry drift like real VO."""
    # boxes off the trajectory ring (circle radius 8 around (x, z) = (0, 8)):
    # inside the ring (r < 4) and outside it (r > 13)
    rngb = np.random.RandomState(7)
    centers = []
    while len(centers) < 14:
        c = rngb.uniform(-22, 22, 3)
        c[1] = rngb.uniform(-1.5, 0.5)
        c[2] = rngb.uniform(-14, 30)
        r_ring = np.hypot(c[0], c[2] - 8.0)
        if r_ring < 4.0 or r_ring > 13.0:
            centers.append(c)
    scene = default_scene(wall_x=25.0, front_z=45.0, back_z=-25.0)
    scene = scene._replace(
        box_centers=jnp.asarray(np.stack(centers), jnp.float32),
        box_half=jnp.asarray(rngb.uniform(0.5, 2.0, (14, 3)), jnp.float32),
        box_phase=jnp.asarray(rngb.uniform(0, 6.28, (14, 2)), jnp.float32),
    )
    K = kitti_like_intrinsics(W, H)
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], W, H, LVLS)
    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=LVLS),
        # icp_thres tightened: the synthetic world's smooth surfaces give
        # low ICP fitness even for wrong alignments; the direct estimator is
        # the primary acceptance path (as in the reference)
        loop=cfg.loop.__class__(loop_margin=6, lidar_range=40.0,
                                scan_context_thres=0.33, icp_thres=0.25),
    )
    gt = loop_trajectory(N_KF, radius=8.0, laps=1.5)
    # drifted estimates: random-walk odometry error (a constant body-frame
    # bias would integrate to ~zero around closed laps and leave nothing for
    # the loop closure to correct)
    rng = np.random.RandomState(seed)
    est = [gt[0]]
    for i in range(1, N_KF):
        step = np.linalg.inv(gt[i - 1]) @ gt[i]
        xi = rng.randn(6) * drift_per_step * np.array(
            [2.0, 0.5, 2.0, 0.05, 0.2, 0.05])
        D = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        est.append(est[-1] @ step @ D)
    est = [e.astype(np.float32) for e in est]

    stream = []
    rng2 = np.random.RandomState(1)
    for i in range(N_KF):
        img, depth = render(scene, jnp.asarray(gt[i]), jnp.asarray(K), W, H)
        pyr = build_pyramid(img, LVLS)
        # sparse "marginalized points" with GT depth
        us = rng2.randint(4, W - 5, 300).astype(np.float32)
        vs = rng2.randint(4, H - 5, 300).astype(np.float32)
        d = np.asarray(depth)[vs.astype(int), us.astype(int)]
        pts_cam = np.stack([
            (us - K[0, 2]) / K[0, 0] * d, (vs - K[1, 2]) / K[1, 1] * d, d], -1)
        cols = []
        imgs = np.asarray(img)
        for lvl in range(LVLS):
            ul = ((us + 0.5) / (1 << lvl) - 0.5).astype(int)
            vl = ((vs + 0.5) / (1 << lvl) - 0.5).astype(int)
            lv = np.asarray(pyr.data[lvl][..., 0])
            cols.append(lv[np.clip(vl, 0, lv.shape[0] - 1),
                           np.clip(ul, 0, lv.shape[1] - 1)])
        stream.append(MarginalizedKF(
            kf_id=i, incoming_id=i * 2, timestamp=i * 0.4,
            T_wc=est[i], dso_error=0.2, scale_error=2.0,
            pts_cam=pts_cam, pts_colors=np.stack(cols, -1),
            pyr=tuple(pyr.data),
        ))
    return cfg, intr, stream, gt, est


def test_loop_detected_and_corrected():
    cfg, intr, stream, gt, est = make_loop_stream()
    handler = LoopHandler(cfg, intr, threaded=False)
    for mkf in stream:
        handler.publish_keyframe(mkf)

    n_loops = handler.direct_loop_count + handler.icp_loop_count
    assert n_loops >= 1, "no loop closure found"

    # drift metric: mean position error of ALL keyframes relative to the
    # (fixed) newest one; PGO must shrink it vs the drifted odometry
    opt = [lf.T_wc for lf in handler.frames]
    def rel_err(poses):
        Tn = poses[-1]
        errs = []
        for i in range(len(poses)):
            rel = np.linalg.inv(Tn) @ poses[i]
            rel_gt = np.linalg.inv(gt[-1]) @ gt[i]
            errs.append(np.linalg.norm(rel[:3, 3] - rel_gt[:3, 3]))
        return float(np.mean(errs))
    err_drift = rel_err(est)
    err_opt = rel_err(opt)
    assert err_opt < 0.7 * err_drift, (err_drift, err_opt)

    # sodso rows keep the original (drifted) trajectory, dslam the corrected
    sodso = handler.odometry_rows()
    dslam = handler.optimized_rows()
    assert len(sodso) == len(dslam) == N_KF
    d_orig = np.linalg.norm(np.asarray(sodso[-1][1:]) - est[-1][:3, 3])
    assert d_orig < 1e-6


def test_threaded_handler_matches_sync():
    """The background-thread path (reference LoopHandler runs on its own
    thread, LoopHandler.cpp:93-141) must produce the same loops and the
    same optimized trajectory as synchronous processing."""
    cfg, intr, stream, gt, est = make_loop_stream()
    sync = LoopHandler(cfg, intr, threaded=False)
    for mkf in stream:
        sync.publish_keyframe(mkf)

    thr = LoopHandler(cfg, intr, threaded=True)
    for mkf in stream:
        thr.publish_keyframe(mkf)
    thr.close()   # drains the queue, then stops the worker

    assert thr.direct_loop_count == sync.direct_loop_count
    assert thr.icp_loop_count == sync.icp_loop_count
    assert len(thr.frames) == len(sync.frames)
    opt_s = np.stack([lf.T_wc for lf in sync.frames])
    opt_t = np.stack([lf.T_wc for lf in thr.frames])
    np.testing.assert_allclose(opt_t, opt_s, atol=1e-5)
    assert thr.optimized_rows() == sync.optimized_rows()


def test_loop_disabled_when_scale_failed():
    cfg, intr, stream, gt, est = make_loop_stream()
    for mkf in stream:
        mkf.scale_error = -1.0   # scale opt failed -> LC bypassed
    handler = LoopHandler(cfg, intr, threaded=False)
    for mkf in stream:
        handler.publish_keyframe(mkf)
    assert handler.direct_loop_count + handler.icp_loop_count == 0
    assert len(handler.frames) == N_KF   # recording continues


def test_db_frame_index_translation_with_skipped_frames():
    """Frames that skip the Scan-Context stage (scale_error < 0) never
    enter the ringkey database, so database ordinals and frame indices
    diverge; the handler must translate through db_to_frame. (The
    REFERENCE indexes loop_frames_ directly with FLANN indices into
    ringkeys_, LoopHandler.cpp:246-262 — it silently retrieves the wrong
    keyframe after any skipped frame. Fixed here, regression-covered.)"""
    cfg, intr, stream, gt, est = make_loop_stream()
    # make frames 1, 2 and 7 skip (scale failed)
    for i in (1, 2, 7):
        stream[i].scale_error = -1.0
    handler = LoopHandler(cfg, intr, threaded=False)
    for mkf in stream:
        handler.publish_keyframe(mkf)
    # every processed frame got a db entry in order, skipped ones absent
    expected = [i for i in range(len(stream)) if i not in (1, 2, 7)]
    assert handler.db_to_frame == expected
    # a genuine loop is still found and correct despite the offset
    assert handler.direct_loop_count + handler.icp_loop_count >= 1
    for k, lf in enumerate(handler.frames):
        for (j, Z, w_t, w_r) in lf.edges:
            if k - j <= 1:
                continue
            # matched frame must be spatially near the current one (true
            # revisit), which an off-by-N index would violate
            d = np.linalg.norm(gt[k][:3, 3] - gt[j][:3, 3])
            assert d < 4.0, (k, j, d)


def test_pca_alignment_is_proper_rotation():
    from direct_stereo_slam_tpu.loop.scancontext import align_points_pca

    rng = np.random.RandomState(0)
    for i in range(50):
        pts = rng.randn(200, 3) * np.array([1.0, 0.3, 2.0]) + rng.randn(3)
        _, tfm = align_points_pca(pts)
        R = tfm[:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.99, (i, np.linalg.det(R))
