"""Loop-closure component tests: scan context, retrieval, ICP, pose graph."""

import numpy as np
import jax.numpy as jnp

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry import lie
from direct_stereo_slam_tpu.loop import icp as icp_mod
from direct_stereo_slam_tpu.loop import pose_graph, retrieval, scancontext
from direct_stereo_slam_tpu.loop.scan import NearbyPointCloud


def random_scan(n=800, seed=0, rng_range=40.0):
    r = np.random.RandomState(seed)
    # structured "urban" scan: points on a few walls + ground
    pts = []
    for k in range(6):
        c = r.uniform(-25, 25, 3)
        c[1] = r.uniform(-2, 2)
        extent = r.uniform(2, 8, 3)
        pts.append(c + r.uniform(-1, 1, (n // 6, 3)) * extent)
    pts = np.concatenate(pts)
    return pts[np.linalg.norm(pts, axis=1) < rng_range]


class TestScanContext:
    def test_rotation_invariance(self):
        scan = random_scan()
        yaw = 1.2
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        scan_rot = scan @ R.T + np.array([1.5, 0.2, -0.8])
        a = scancontext.generate(scan, 40.0)
        b = scancontext.generate(scan_rot, 40.0)
        # ringkeys nearly equal, signature difference small
        assert np.linalg.norm(a.ringkey - b.ringkey) < 0.12
        d = scancontext.signature_difference(a.signature, b.signature)
        assert d < 0.15, d

    def test_different_scans_differ(self):
        a = scancontext.generate(random_scan(seed=1), 40.0)
        b = scancontext.generate(random_scan(seed=99), 40.0)
        d = scancontext.signature_difference(a.signature, b.signature)
        assert d > 0.2, d

    def test_pca_pose_recovers_relative_yaw(self):
        """tfm_pca_rig composes into a usable relative-pose prior."""
        scan = random_scan(seed=3)
        yaw = 0.8
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        t = np.array([2.0, 0.1, -1.0])
        # rig B sees the same world points, posed differently:
        # p_B = R^T (p_A - t)
        scan_b = (scan - t) @ R
        a = scancontext.generate(scan, 40.0)
        b = scancontext.generate(scan_b, 40.0)
        # tfm_a_b = inv(tfm_pca_a) @ tfm_pca_b maps B-frame to A-frame
        tfm_ab = np.linalg.inv(a.tfm_pca_rig) @ b.tfm_pca_rig
        # allow PCA sign flips: compare the action on points
        mapped = scan_b @ tfm_ab[:3, :3].T + tfm_ab[:3, 3]
        err = np.abs(mapped - scan).mean()
        assert err < 1.0, err


class TestRetrieval:
    def test_insertion_lag_and_match(self):
        db = retrieval.RingkeyDatabase(knn=3, loop_margin=5, ringkey_thres=0.1)
        rng = np.random.RandomState(0)
        keys = [rng.rand(20).astype(np.float32) for _ in range(30)]
        # revisit key 2 at step 25
        keys.append(keys[2] + 1e-3)
        found_at = None
        for i, k in enumerate(keys):
            cands = db.search_and_insert(k)
            if i < 8:
                assert cands == []  # nothing in db yet (lag 5 + knn guard)
            if i == len(keys) - 1:
                found_at = cands
        assert found_at and 2 in found_at


class TestICP:
    def test_recovers_transform(self):
        src = random_scan(seed=5)
        T_gt = np.asarray(lie.se3_exp(
            jnp.asarray([0.4, -0.2, 0.6, 0.03, 0.08, -0.02], jnp.float32)))
        dst = src @ np.asarray(T_gt)[:3, :3].T + np.asarray(T_gt)[:3, 3]
        T0 = np.eye(4)
        ok, T, fit = icp_mod.icp(src, dst, T0, max_iterations=10)
        assert ok
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(T_gt) @ T, jnp.float32)))
        assert np.linalg.norm(err) < 0.05, err


class TestPoseGraph:
    def test_loop_correction_distributes_drift(self):
        """A chain with accumulated drift + a loop edge to the start: after
        optimization the newest (fixed) node keeps its pose and the chain
        bends so the loop constraint is satisfied."""
        n = 12
        # ground truth: straight line in z
        gt = [np.eye(4) for _ in range(n)]
        for i in range(n):
            gt[i] = np.eye(4)
            gt[i][2, 3] = i * 1.0
        # odometry with small bias -> drifted poses
        est = [np.eye(4)]
        for i in range(1, n):
            step = np.eye(4)
            step[2, 3] = 1.0
            step[0, 3] = 0.05   # lateral drift per step
            est.append(est[-1] @ step)
        est = [e.astype(np.float32) for e in est]

        edges = []
        for i in range(1, n):
            Z = np.linalg.inv(est[i]) @ est[i - 1]   # measured odometry
            edges.append((i, i - 1, Z.astype(np.float32), 1.0, 1e4))
        # loop edge: node n-1 observes node 0 at the TRUE relative pose
        Z_loop = np.linalg.inv(gt[n - 1]) @ gt[0]
        edges.append((n - 1, 0, Z_loop.astype(np.float32), 10.0, 1e5))

        data = pose_graph.build_data(np.stack(est), edges, fixed_node=n - 1)
        T_opt = np.asarray(pose_graph.optimize(data, 25))

        # fixed node unchanged
        np.testing.assert_allclose(T_opt[n - 1], est[n - 1], atol=1e-4)
        # loop constraint satisfied: relative pose of 0 wrt n-1 close to GT
        rel = np.linalg.inv(T_opt[n - 1]) @ T_opt[0]
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(Z_loop) @ rel, jnp.float32)))
        assert np.linalg.norm(err) < 0.05, err
        # node 0 moved from its drifted estimate toward consistency
        moved = np.linalg.norm(T_opt[0][:3, 3] - est[0][:3, 3])
        assert moved > 0.1

    def test_information_block_convention(self):
        """Pin the g2o edge-weight semantics (LoopHandler.h:50-64 parity):
        the reference builds `g2o::EdgeSE3` edges whose error vector is
        `internal::toVectorMQT(delta)` — TRANSLATION in components 0-2,
        compact quaternion (rotation) in 3-5 — so `topLeftCorner<3,3> *=
        1/scale_error` weights translation and `bottomRightCorner<3,3> *=
        POSE_R_WEIGHT` weights rotation (matching the header comment: DSO
        rotation is more accurate than translation). Our tangent order is
        also translation-first ([t, w], lie.py:4), with edge_w_t on r[0:3]
        and edge_w_r on r[3:6]. This test asserts the behavior: with the
        translation weight >> rotation weight, a conflicting loop edge
        corrects the translation and leaves rotation nearly untouched, and
        vice versa."""
        def solve(w_t, w_r):
            # two nodes; odometry says identity; node 1 fixed.
            est = np.stack([np.eye(4, dtype=np.float32)] * 2)
            # loop edge wants node 0 moved +1m in x AND yawed 0.3 rad
            xi = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.3], jnp.float32)
            T_tgt = np.asarray(lie.se3_exp(xi))  # desired T_w0
            Z = np.linalg.inv(est[1]) @ T_tgt    # measurement T_1->0
            edges = [
                # weak identity odometry edge resisting both corrections
                (1, 0, np.eye(4, dtype=np.float32), 1.0, 1.0),
                (1, 0, Z.astype(np.float32), w_t, w_r),
            ]
            data = pose_graph.build_data(est, edges, fixed_node=1)
            T = np.asarray(pose_graph.optimize(data, 20))
            dt = np.linalg.norm(T[0][:3, 3] - T_tgt[:3, 3])
            dr = np.asarray(lie.se3_log(jnp.asarray(
                np.linalg.inv(T_tgt) @ T[0], jnp.float32)))[3:]
            return dt, np.linalg.norm(dr)

        # translation-heavy information: translation snaps to the loop
        # edge, rotation stays near the (identity) odometry compromise
        dt, dr = solve(w_t=1e6, w_r=1.0)
        assert dt < 1e-3, dt
        assert dr > 0.1, dr
        # rotation-heavy information: the opposite
        dt, dr = solve(w_t=1.0, w_r=1e6)
        assert dr < 1e-3, dr
        assert dt > 0.3, dt

    def test_cg_solver_matches_dense(self):
        """The matrix-free block-Jacobi PCG backend must reproduce the
        dense solve (same GN trajectory) on a drifted loop chain."""
        rng = np.random.RandomState(3)
        n = 40
        gt, est = [np.eye(4, dtype=np.float32)], [np.eye(4, dtype=np.float32)]
        for i in range(1, n):
            ang = 2 * np.pi * i / n
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 8 * np.sin(ang)
            T[2, 3] = 8 * (1 - np.cos(ang))
            gt.append(T)
            step = np.linalg.inv(gt[i - 1]) @ gt[i]
            xi = rng.randn(6).astype(np.float32) * np.array(
                [0.02, 0.005, 0.02, 0.001, 0.004, 0.001], np.float32)
            D = np.asarray(lie.se3_exp(jnp.asarray(xi)))
            est.append((est[-1] @ step @ D).astype(np.float32))
        edges = []
        for i in range(1, n):
            Z = np.linalg.inv(est[i]) @ est[i - 1]
            edges.append((i, i - 1, Z.astype(np.float32), 1.0, 1e4))
        Z_loop = np.linalg.inv(gt[n - 1]) @ gt[0]
        edges.append((n - 1, 0, Z_loop.astype(np.float32), 10.0, 1e5))
        data = pose_graph.build_data(np.stack(est), edges, fixed_node=n - 1)
        T_dense = np.asarray(pose_graph.optimize(data, 15, solver="dense"))
        T_cg = np.asarray(pose_graph.optimize(data, 15, solver="cg"))
        scale = np.abs(T_dense[:, :3, 3]).max()
        np.testing.assert_allclose(T_cg[:n], T_dense[:n], atol=2e-3 * scale)


class TestScanGeneration:
    def test_rolling_cloud_and_range_gate(self):
        cfg = make_config(320, 96)
        cloud = NearbyPointCloud(cfg)
        rng = np.random.RandomState(0)
        T0 = np.eye(4)
        pts = rng.uniform(-30, 30, (500, 3))
        cloud.add_keyframe_points(0, T0, pts)
        scan = cloud.generate_scan(np.linalg.inv(T0))
        assert len(scan) > 50
        assert (np.linalg.norm(scan, axis=1) < cfg.loop.lidar_range).all()

    def test_orientation_trim(self):
        cfg = make_config(320, 96)
        cloud = NearbyPointCloud(cfg)
        rng = np.random.RandomState(1)
        T0 = np.eye(4)
        cloud.add_keyframe_points(0, T0, rng.uniform(-10, 10, (200, 3)))
        # rotate the current frame far beyond the trim threshold
        yaw = 1.2
        T_cur = np.eye(4)
        T_cur[:3, :3] = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                                  [-np.sin(yaw), 0, np.cos(yaw)]])
        scan = cloud.generate_scan(np.linalg.inv(T_cur))
        assert len(scan) == 0  # all points trimmed
