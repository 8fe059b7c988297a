"""Windowed photometric BA tests on synthetic frames with exact geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from direct_stereo_slam_tpu.config import make_config, PATTERN_OFFSETS
from direct_stereo_slam_tpu.geometry import lie
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.models import ba
from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

W_IMG, H_IMG = 256, 80
# pool segment per slot must fit the single-host window's 400 points
N_SLOTS, N_POINTS = 4, 1600


def build_window(n_frames=3, n_pts=400, speed=0.3, perturb_pose=0.0,
                 perturb_idepth=0.0, seed=0, hosts="multi"):
    ds = SyntheticStereoDataset(n_frames=n_frames, width=W_IMG, height=H_IMG,
                                speed=speed, yaw_rate=0.015)
    cfg = make_config(W_IMG, H_IMG, preset=0, mode=1)
    K = ds.K
    calib = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float32)
    state = ba.empty_state(N_SLOTS, N_POINTS, H_IMG, W_IMG, calib)

    rng = np.random.RandomState(seed)
    frames = [ds.frame(i) for i in range(n_frames)]
    T_cw_gt = [np.linalg.inv(f["pose_w_c0"]) for f in frames]

    for i, f in enumerate(frames):
        planes = build_pyramid(f["img0"], 1).data[0]
        T = T_cw_gt[i].copy()
        if i > 0 and perturb_pose > 0:
            xi = rng.randn(6) * perturb_pose
            xi[3:] *= 0.3
            T = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))) @ T
        state = ba.add_frame(state, i, i, T, np.zeros(2), 1.0, planes)

    # host points within each host's pool SEGMENT (segment s = pool rows
    # [s*P, (s+1)*P); the BA's block-factored assembly requires this
    # invariant). hosts="multi" spreads points over all frames (exercises
    # every host/target block); hosts="single" puts them all in frame 0
    # (exact world points — the clean landscape for convergence assertions).
    P = N_POINTS // N_SLOTS
    host_frames = list(range(n_frames)) if hosts == "multi" else [0]
    per = min(P, n_pts // len(host_frames))
    idepth_gt_full = np.zeros(n_pts, np.float32)
    k0 = 0
    for h in host_frames:
        us = rng.randint(4, W_IMG - 5, per).astype(np.float32)
        vs = rng.randint(4, H_IMG - 5, per).astype(np.float32)
        depth = np.asarray(frames[h]["depth0"])[vs.astype(int), us.astype(int)]
        id_gt = (1.0 / depth).astype(np.float32)
        idepth = id_gt.copy()
        if perturb_idepth > 0:
            idepth = idepth * (1.0 + rng.randn(per).astype(np.float32) * perturb_idepth)
        img = np.asarray(frames[h]["img0"])
        color = np.zeros((per, 8), np.float32)
        for k, (du, dv) in enumerate(PATTERN_OFFSETS):
            color[:, k] = img[
                np.clip((vs + dv).astype(int), 0, H_IMG - 1),
                np.clip((us + du).astype(int), 0, W_IMG - 1),
            ]
        idx = jnp.arange(h * P, h * P + per)
        state = ba.add_points(
            state, idx, h,
            jnp.asarray(us), jnp.asarray(vs), jnp.asarray(idepth),
            jnp.asarray(color), jnp.ones((per, 8), jnp.float32),
            jnp.ones(per, bool),
        )
        idepth_gt_full[k0:k0 + per] = id_gt
        k0 += per
    idepth_gt = idepth_gt_full[:k0]
    n_pts = k0
    # adaptive per-frame energy thresholds (the pipeline sets these as each
    # KF arrives); without them occlusion residuals sit just under the
    # default threshold and bias the optimization
    for i in range(1, n_frames):
        state = ba.set_new_frame_energy_th(state, jnp.int32(i), cfg)
    # the host frame never targets itself; give it the next KF's threshold
    # (DSO copies the previous KF's frameEnergyTH, FrontEnd.cpp:770)
    state = state._replace(energy_th=state.energy_th.at[0].set(state.energy_th[1]))
    point_index = np.concatenate(
        [np.arange(h * P, h * P + per) for h in host_frames])
    return ds, cfg, state, T_cw_gt, (idepth_gt, point_index)


def pose_errors(state, T_cw_gt):
    T_cur = np.asarray(state.T_current())
    errs = []
    for i in range(len(T_cw_gt)):
        d = np.linalg.inv(T_cw_gt[i]) @ T_cur[i]
        errs.append(np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(d, jnp.float32)))))
    return errs


class TestLinearize:
    def test_energy_at_gt_much_lower_than_perturbed(self):
        """At ground truth the remaining energy is resampling error (the
        fronto-parallel patch assumption on slanted planes + bilinear); it
        must be several times below a slightly-perturbed window's energy.
        (Exact-zero case — identity warp — is covered by construction: the
        warp/gather/color conventions agree to ~1e-9.)"""
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window()
        lin = ba.linearize(state, cfg)
        assert float(lin.num_terms) > 0
        e_gt = float(lin.energy) / jnp.maximum(float(lin.num_terms) / 8, 1)
        ds, cfg, state_p, _, _ = build_window(perturb_pose=0.02)
        lin_p = ba.linearize(state_p, cfg)
        e_p = float(lin_p.energy) / jnp.maximum(float(lin_p.num_terms) / 8, 1)
        assert e_gt < e_p / 3.0, (e_gt, e_p)

    def test_gradient_nonzero_when_perturbed(self):
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window(perturb_pose=0.01)
        lin = ba.linearize(state, cfg)
        assert float(jnp.linalg.norm(lin.bf)) > 1.0


class TestOptimize:
    def test_recovers_pose_perturbation(self):
        # single-host window: frame 0 hosts every point with exact idepth, so
        # the implied world points are correct and the photometric minimum
        # sits at GT (up to the synthetic world's bilinear-resampling bias).
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window(
            perturb_pose=0.02, speed=0.8, hosts="single")
        errs0 = pose_errors(state, T_gt)
        state2, rmse, ok = ba.optimize(state, cfg, 8)
        errs1 = pose_errors(state2, T_gt)
        assert bool(ok)
        assert errs1[0] == 0.0  # anchor frame exactly fixed
        assert errs1[1] < max(errs0[1] * 0.45, 0.012), (errs0, errs1)
        assert errs1[2] < max(errs0[2] * 0.75, 0.015), (errs0, errs1)
        assert float(rmse) < 12.0

    def test_multihost_reduces_energy_and_grows_inliers(self):
        # multi-host window with perturbed host poses: the implied world
        # points are themselves wrong, so the energy landscape is rough
        # (wrong-world-point compromises + resampling ripple) and pose-vs-GT
        # error is not a meaningful optimizer metric at sub-pixel scale.
        # What BA guarantees: energy drops substantially and previously
        # capped residuals come back below threshold (inlier count GROWS).
        ds, cfg, state, T_gt, _ = build_window(perturb_pose=0.02, speed=0.8)
        lin0 = ba.linearize(state, cfg)
        state2, rmse, ok = ba.optimize(state, cfg, 8)
        lin1 = ba.linearize(state2, cfg)
        assert bool(ok)
        assert float(lin1.energy) < 0.4 * float(lin0.energy)
        assert float(lin1.num_terms) > 1.1 * float(lin0.num_terms)
        assert float(rmse) < 12.0

    def test_recovers_idepth_perturbation(self):
        # small (sub-pixel-reprojection) perturbation: points stay inside the
        # photometric basin and inliers; larger jumps are correctly treated
        # as outliers by the energy threshold (DSO behavior) and cannot be
        # recovered by local optimization.
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window(perturb_idepth=0.1, speed=0.8)
        state2, rmse, ok = ba.optimize(state, cfg, 8)
        id_est = np.asarray(state2.p_idepth)[pidx]
        rel0 = np.abs(np.asarray(state.p_idepth)[pidx] - id_gt) / id_gt
        rel1 = np.abs(id_est - id_gt) / id_gt
        # recovers toward the ~3% bias floor of the synthetic world
        assert np.median(rel1) < np.median(rel0) * 0.75, (
            np.median(rel0), np.median(rel1))
        assert np.median(rel1) < 0.055

    def test_energy_decreases(self):
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window(perturb_pose=0.02, perturb_idepth=0.1)
        e0 = float(ba.linearize(state, cfg).energy)
        state2, rmse, ok = ba.optimize(state, cfg, 6)
        e1 = float(ba.linearize(state2, cfg).energy)
        assert e1 < e0 * 0.5, (e0, e1)


class TestMarginalization:
    def test_point_marginalization_keeps_window_solvable(self):
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window(
            perturb_pose=0.015, hosts="single")
        errs0 = pose_errors(state, T_gt)
        n = state.num_points
        marg = jnp.arange(n) < 100  # marginalize 100 of slot-0's points
        n_valid0 = int(jnp.sum(state.p_valid))
        state = ba.marginalize_points(state, marg, cfg)
        assert int(jnp.sum(state.p_valid)) == n_valid0 - 100
        assert float(jnp.linalg.norm(state.HM)) > 0
        state2, rmse, ok = ba.optimize(state, cfg, 8)
        errs1 = pose_errors(state2, T_gt)
        assert errs1[1] < max(errs0[1] * 0.6, 0.016)

    def test_marginalization_schur_algebra(self):
        """Exact algebraic check: marginalize_points + marginalize_frame must
        produce the same (HM, bM) as a directly-computed Schur complement of
        the joint [frames | idepths] system over idepths and the removed
        frame block."""
        ds, cfg, state, T_gt, (id_gt, pidx) = build_window(n_frames=3)
        lin = ba.linearize(state, cfg)
        n = state.num_points
        D = 4 + 8 * state.num_slots

        # direct Schur over all idepths (with the pass's prior-free Hdd)
        Hdd = np.asarray(lin.Hdd)
        keep = Hdd > 1e-10
        inv_Hdd = np.where(keep, 1.0 / np.maximum(Hdd, 1e-10), 0.0)
        Hfd = np.asarray(lin.Hfd)
        H_direct = np.asarray(lin.Hff) - (Hfd.T * inv_Hdd[None, :]) @ Hfd
        b_direct = np.asarray(lin.bf) - Hfd.T @ (inv_Hdd * np.asarray(lin.bd))
        w = cfg.ba.marg_weight_fac

        state_m = ba.marginalize_points(state, jnp.ones(n, bool), cfg)
        np.testing.assert_allclose(
            np.asarray(state_m.HM), w * H_direct, rtol=1e-3, atol=1e-2 * np.abs(H_direct).max()
        )
        # bM convention: gradient at x=0; x0 is 0 here (fresh window)
        np.testing.assert_allclose(
            np.asarray(state_m.bM), w * b_direct, rtol=1e-3,
            atol=1e-2 * np.abs(b_direct).max(),
        )

        # frame Schur: remove slot 0's 8 params. Slot 0 is the gauge anchor,
        # so marginalize_frame folds a 1e8 anchor prior into its block first
        # (absolute-anchoring transfer).
        HM = w * H_direct
        bM = w * b_direct
        HM = HM + np.diag(np.r_[np.zeros(4), 1e8 * np.ones(8), np.zeros(D - 12)])
        blk = slice(4, 12)
        keep_idx = np.r_[0:4, 12:D]
        Hbb = HM[blk, blk] + 1e-8 * np.eye(8)
        Hab = HM[np.ix_(keep_idx, range(4, 12))]
        Hbbinv = np.linalg.inv(Hbb)
        H_after = HM[np.ix_(keep_idx, keep_idx)] - Hab @ Hbbinv @ Hab.T
        b_after = bM[keep_idx] - Hab @ (Hbbinv @ bM[blk])

        state_f = ba.marginalize_frame(state_m, jnp.int32(0))
        HM_f = np.asarray(state_f.HM)[np.ix_(keep_idx, keep_idx)]
        bM_f = np.asarray(state_f.bM)[keep_idx]
        np.testing.assert_allclose(HM_f, H_after, rtol=1e-3, atol=1e-2 * np.abs(H_after).max())
        np.testing.assert_allclose(bM_f, b_after, rtol=1e-3, atol=1e-2 * np.abs(b_after).max())
        # removed rows/cols zeroed, slot freed
        assert not bool(state_f.frame_valid[0])
        assert np.allclose(np.asarray(state_f.HM)[blk, :], 0.0)


class TestPoolOverflow:
    """The pool is one shared budget: points may live in ANY pool row
    regardless of host slot (the assembly groups by p_host via one-hot,
    not by segment) — VERDICT r1 item 8."""

    def test_linearize_invariant_under_row_permutation(self):
        """Permuting pool rows (breaking the old segment invariant) must
        not change the BA system: energy, frame Hessian and the per-point
        blocks (under the same permutation) all agree."""
        _, cfg, state, _, _ = build_window(perturb_pose=0.02,
                                           perturb_idepth=0.1)
        rng = np.random.RandomState(3)
        perm = rng.permutation(N_POINTS)
        permute = lambda a: a[perm] if a.ndim >= 1 and a.shape[0] == N_POINTS else a
        state_p = state._replace(
            p_valid=state.p_valid[perm], p_host=state.p_host[perm],
            p_u=state.p_u[perm], p_v=state.p_v[perm],
            p_idepth=state.p_idepth[perm],
            p_idepth_zero=state.p_idepth_zero[perm],
            p_color=state.p_color[perm], p_weight=state.p_weight[perm],
            p_prior=state.p_prior[perm], p_res_good=state.p_res_good[perm],
        )
        lin = ba.linearize(state, cfg)
        lin_p = ba.linearize(state_p, cfg)
        np.testing.assert_allclose(float(lin_p.energy), float(lin.energy),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lin_p.Hff), np.asarray(lin.Hff),
                                   rtol=2e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(lin_p.bf), np.asarray(lin.bf),
                                   rtol=2e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(lin_p.Hdd),
                                   np.asarray(lin.Hdd)[perm], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(lin_p.Hfd),
                                   np.asarray(lin.Hfd)[perm],
                                   rtol=2e-4, atol=1e-3)

    def test_optimize_converges_with_out_of_segment_hosting(self):
        """A permuted (segment-violating) window must optimize exactly as
        well as the segmented one."""
        _, cfg, state, T_gt, _ = build_window(perturb_pose=0.02)
        rng = np.random.RandomState(4)
        perm = rng.permutation(N_POINTS)
        state_p = state._replace(
            p_valid=state.p_valid[perm], p_host=state.p_host[perm],
            p_u=state.p_u[perm], p_v=state.p_v[perm],
            p_idepth=state.p_idepth[perm],
            p_idepth_zero=state.p_idepth_zero[perm],
            p_color=state.p_color[perm], p_weight=state.p_weight[perm],
            p_prior=state.p_prior[perm], p_res_good=state.p_res_good[perm],
        )
        _, rmse_a, ok_a = ba.optimize(state, cfg, 6)
        _, rmse_b, ok_b = ba.optimize(state_p, cfg, 6)
        assert bool(ok_a) and bool(ok_b)
        np.testing.assert_allclose(float(rmse_b), float(rmse_a), rtol=1e-4)
