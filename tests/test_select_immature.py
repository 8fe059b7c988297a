"""Pixel selector + immature point trace/activation tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.models import immature
from direct_stereo_slam_tpu.ops.pyramid import build_pyramid
from direct_stereo_slam_tpu.ops.select import adapt_potential, make_selection_map

pytestmark = pytest.mark.smoke

W, H = 320, 96


def setup():
    ds = SyntheticStereoDataset(n_frames=3, width=W, height=H, speed=0.4)
    cfg = make_config(W, H, preset=0, mode=1)
    return ds, cfg


class TestSelector:
    def test_selection_counts_and_types(self):
        ds, cfg = setup()
        f = ds.frame(0)
        pyr = build_pyramid(f["img0"], 3)
        sel, count = make_selection_map(
            pyr.abs_grad[0], pyr.abs_grad[1], pyr.abs_grad[2], 5, cfg
        )
        c = int(count)
        assert 100 < c < W * H // 4
        vals = np.unique(np.asarray(sel))
        assert set(vals.tolist()) <= {0, 1, 2, 4}

    def test_potential_controls_density(self):
        ds, cfg = setup()
        f = ds.frame(0)
        pyr = build_pyramid(f["img0"], 3)
        counts = []
        for pot in (3, 6, 12):
            _, count = make_selection_map(
                pyr.abs_grad[0], pyr.abs_grad[1], pyr.abs_grad[2], pot, cfg
            )
            counts.append(int(count))
        assert counts[0] > counts[1] > counts[2]

    def test_adapt_potential(self):
        assert adapt_potential(5, got=100, want=1000) < 5
        assert adapt_potential(5, got=5000, want=1000) > 5
        assert adapt_potential(5, got=1000, want=1000) == 5


class TestTraceActivation:
    def make_points(self, ds, cfg, n_budget=512):
        f0 = ds.frame(0)
        pyr0 = build_pyramid(f0["img0"], 3)
        sel, _ = make_selection_map(
            pyr0.abs_grad[0], pyr0.abs_grad[1], pyr0.abs_grad[2], 6, cfg
        )
        pts = immature.create_points(pyr0.data[0], sel, n_budget)
        return f0, pyr0, pts

    def test_create_points(self):
        ds, cfg = setup()
        f0, pyr0, pts = self.make_points(ds, cfg)
        n = int(jnp.sum(pts.valid))
        assert n > 100
        img = np.asarray(f0["img0"])
        m = np.asarray(pts.valid)
        pu = np.asarray(pts.u)[m].astype(int)
        pv = np.asarray(pts.v)[m].astype(int)
        np.testing.assert_allclose(np.asarray(pts.color)[m, 4], img[pv, pu], atol=1e-3)

    def test_stereo_trace_recovers_depth(self):
        """Trace left-image points against the right image: the recovered
        idepth interval must bracket ground truth."""
        ds, cfg = setup()
        f0, pyr0, pts = self.make_points(ds, cfg)
        pyr1 = build_pyramid(f0["img1"], 1)
        K = ds.K
        # host(cam0) -> target(cam1): T_stereo is pose of cam0 in cam1
        T = ds.t_cam1_cam0
        KRKi = jnp.asarray(K @ T[:3, :3] @ np.linalg.inv(K), jnp.float32)
        Kt = jnp.asarray(K @ T[:3, 3], jnp.float32)

        out = immature.trace_points(
            pts, pyr1.data[0], KRKi, Kt, jnp.float32(1.0), jnp.float32(0.0), cfg
        )
        good = np.asarray(out.status) == immature.IPS_GOOD
        assert good.sum() > 50, f"only {good.sum()} good traces"

        depth_gt = np.asarray(f0["depth0"])
        gu = np.asarray(out.u)[good].astype(int)
        gv = np.asarray(out.v)[good].astype(int)
        id_gt = 1.0 / depth_gt[gv, gu]
        id_mid = 0.5 * (np.asarray(out.idepth_min) + np.asarray(out.idepth_max))[good]
        rel = np.abs(id_mid - id_gt) / id_gt
        # trace step is 1 px; with fx*baseline ~ 100, idepth resolution at
        # idepth 0.1 is ~10%; median should be well inside that
        assert np.median(rel) < 0.15, np.median(rel)
        # intervals should mostly bracket GT (with slack)
        inside = (
            (np.asarray(out.idepth_min)[good] - 0.05 * id_gt <= id_gt)
            & (id_gt <= np.asarray(out.idepth_max)[good] + 0.05 * id_gt)
        )
        assert inside.mean() > 0.8, inside.mean()

    def test_mono_trace_narrows_interval(self):
        """Repeated traces against successive frames shrink the interval."""
        ds, cfg = setup()
        f0, pyr0, pts = self.make_points(ds, cfg)
        K = ds.K
        Ki = np.linalg.inv(K)
        widths = []
        for i in (1, 2):
            fi = ds.frame(i)
            pyr_t = build_pyramid(fi["img0"], 1)
            T_th = np.linalg.inv(fi["pose_w_c0"]) @ f0["pose_w_c0"]
            KRKi = jnp.asarray(K @ T_th[:3, :3] @ Ki, jnp.float32)
            Kt = jnp.asarray(K @ T_th[:3, 3], jnp.float32)
            pts = immature.trace_points(
                pts, pyr_t.data[0], KRKi, Kt, jnp.float32(1.0), jnp.float32(0.0), cfg
            )
            good = np.asarray(pts.status) == immature.IPS_GOOD
            w = (np.asarray(pts.idepth_max) - np.asarray(pts.idepth_min))[good]
            widths.append(np.median(w))
            assert good.sum() > 30
        assert widths[1] <= widths[0] * 1.5  # interval stays bounded/shrinks

    def test_compact_trace_matches_full(self):
        """trace_points_all_compact vs the uncompacted oracle on a real
        window shape: searched lanes agree to float tolerance; lanes
        failing a phase-1 gate take the same gate status but keep previous
        quality/interval (DSO's early-return semantics)."""
        import dataclasses
        import jax

        ds, cfg = setup()
        f0, pyr0, pts = self.make_points(ds, cfg, n_budget=256)
        S = 4
        batch = immature.empty_batch(S, 256)
        K = ds.K
        Ki = np.linalg.inv(K)
        KRKi = np.zeros((S, 3, 3), np.float32)
        Kt = np.zeros((S, 3), np.float32)
        rng = np.random.RandomState(3)
        for s in range(S):
            fi = ds.frame(min(s, 2))
            T_th = np.linalg.inv(fi["pose_w_c0"]) @ f0["pose_w_c0"]
            KRKi[s] = K @ T_th[:3, :3] @ Ki
            Kt[s] = K @ T_th[:3, 3] + rng.normal(0, 0.01, 3)
            p = pts
            if s >= 2:   # give some slots pre-shrunk intervals + statuses
                p = immature.trace_points(
                    p, pyr0.data[0], jnp.asarray(KRKi[s]), jnp.asarray(Kt[s]),
                    jnp.float32(1.0), jnp.float32(0.0), cfg)
            batch = immature.set_slot(batch, s, p)
        planes = build_pyramid(ds.frame(1)["img0"], 1).data[0]
        a = jnp.ones(S, jnp.float32)
        b = jnp.zeros(S, jnp.float32)

        full = immature.trace_points_all(batch, planes, jnp.asarray(KRKi),
                                         jnp.asarray(Kt), a, b, cfg)
        # num_steps=64 matches the oracle's grid (production default is
        # cfg.trace.num_steps=48; the comparison needs identical sampling)
        comp, n_search, n_over = immature.trace_points_all_compact(
            batch, planes, jnp.asarray(KRKi), jnp.asarray(Kt), a, b, cfg,
            num_steps=64)
        assert int(n_over) == 0 and int(n_search) > 50

        searched = (np.asarray(comp.status) == immature.IPS_GOOD) | (
            np.asarray(comp.status) == immature.IPS_OUTLIER)
        # gate statuses identical everywhere
        np.testing.assert_array_equal(np.asarray(comp.status),
                                      np.asarray(full.status))
        for name in ("idepth_min", "idepth_max", "quality", "pixel_interval"):
            c = np.asarray(getattr(comp, name))[searched]
            f = np.asarray(getattr(full, name))[searched]
            np.testing.assert_allclose(c, f, rtol=2e-4, atol=2e-4, err_msg=name)
        # non-searched lanes keep their previous interval
        keep = ~searched
        np.testing.assert_array_equal(
            np.asarray(comp.idepth_min)[keep],
            np.asarray(batch.idepth_min)[keep])
        np.testing.assert_array_equal(
            np.asarray(comp.quality)[keep], np.asarray(batch.quality)[keep])

        # overflow: a tiny budget leaves exactly the tail lanes untouched
        cfg_small = cfg.replace(trace=dataclasses.replace(
            cfg.trace, search_budget=16))
        comp2, ns2, nov2 = immature.trace_points_all_compact(
            batch, planes, jnp.asarray(KRKi), jnp.asarray(Kt), a, b,
            cfg_small, num_steps=64)
        assert int(nov2) == int(ns2) - 16 > 0
        # the first 16 searched lanes (row-major) match the full-budget run
        sflat = np.flatnonzero(np.asarray(
            (comp.status == immature.IPS_GOOD)
            | (comp.status == immature.IPS_OUTLIER)).reshape(-1))
        first = sflat[:16]
        np.testing.assert_allclose(
            np.asarray(comp2.idepth_min).reshape(-1)[first],
            np.asarray(comp.idepth_min).reshape(-1)[first], rtol=1e-6)
        rest = sflat[16:]
        np.testing.assert_array_equal(
            np.asarray(comp2.idepth_min).reshape(-1)[rest],
            np.asarray(batch.idepth_min).reshape(-1)[rest])

    def test_activation(self):
        ds, cfg = setup()
        f0, pyr0, pts = self.make_points(ds, cfg)
        K = ds.K
        Ki = np.linalg.inv(K)
        # trace against frames 1 and 2 to establish intervals
        frames = [ds.frame(i) for i in range(3)]
        for i in (1, 2):
            T_th = np.linalg.inv(frames[i]["pose_w_c0"]) @ f0["pose_w_c0"]
            pyr_t = build_pyramid(frames[i]["img0"], 1)
            pts = immature.trace_points(
                pts, pyr_t.data[0],
                jnp.asarray(K @ T_th[:3, :3] @ Ki, jnp.float32),
                jnp.asarray(K @ T_th[:3, 3], jnp.float32),
                jnp.float32(1.0), jnp.float32(0.0), cfg,
            )
        can = immature.can_activate(pts, cfg)
        assert int(jnp.sum(can)) > 30

        images = jnp.stack([build_pyramid(f["img0"], 1).data[0] for f in frames])
        T_cw = jnp.asarray(
            np.stack([np.linalg.inv(f["pose_w_c0"]) for f in frames]), jnp.float32
        )
        out = immature.activate_points(
            pts, jnp.int32(0), images, jnp.ones(3, bool), T_cw,
            jnp.zeros((3, 2)), jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
            jnp.ones(3, jnp.float32), cfg,
        )
        ok = np.asarray(out.ok & can)
        assert ok.sum() > 20
        depth_gt = np.asarray(f0["depth0"])
        gu = np.asarray(pts.u)[ok].astype(int)
        gv = np.asarray(pts.v)[ok].astype(int)
        id_gt = 1.0 / depth_gt[gv, gu]
        rel = np.abs(np.asarray(out.idepth)[ok] - id_gt) / id_gt
        assert np.median(rel) < 0.08, np.median(rel)


def test_flag_points_for_removal_isoob():
    """Pin flagPointsForRemoval's rule set (FrontEnd.cpp:504-583 + DSO
    isOOB/isInlierNew) on a constructed window: each rule fires exactly
    where the reference policy says."""
    from direct_stereo_slam_tpu.models import ba
    from direct_stereo_slam_tpu.models.frontend import _flag_points_for_removal

    _, cfg = setup()
    NP, W = 10, 4
    p_valid = np.ones(NP, bool)
    pid = np.full(NP, 0.5, np.float32)
    n_good = np.full(NP, 3, np.int64)
    Hdd = np.full(NP, 100.0, np.float32)
    pair_good = np.zeros((NP, W), bool)
    pair_good[:, 1:4] = True              # support AWAY from flagged slot 0
    p_num_good = np.full(NP, 20.0, np.float32)
    p_last_res = np.full((NP, 2), ba.RES_IN, np.int32)
    host_flagged = np.zeros(NP, bool)

    # lane 0: healthy -> untouched
    # lane 1: negative idepth -> bad/drop
    pid[1] = -0.1
    # lane 2: zero residuals -> bad/drop
    n_good[2] = 0
    # lane 3: support concentrates in the flagged slot (rule a):
    # n_good=3, vis_in_marg(slot 0)=1 -> 3-1=2 < 3 -> isOOB
    pair_good[3] = [True, True, True, False]
    # lane 4: newest residual OOB (rule b)
    p_last_res[4, 0] = ba.RES_OOB
    # lane 5: last two outliers (rule c)
    p_last_res[5] = [ba.RES_OUTLIER, ba.RES_OUTLIER]
    # lane 6: rule c blocked by n_good < 2
    p_last_res[6] = [ba.RES_OUTLIER, ba.RES_OUTLIER]
    n_good[6] = 1
    # lane 7: isOOB but NOT inlier-new (few lifetime goods) -> drop not marg
    p_last_res[7, 0] = ba.RES_OOB
    p_num_good[7] = 2.0
    # lane 8: isOOB, inlier-new, but weak idepth hessian -> drop
    p_last_res[8, 0] = ba.RES_OOB
    Hdd[8] = 1.0
    # lane 9: rule a blocked by immature lifetime (num_good <= mgr+10)
    pair_good[9] = [True, True, True, False]
    p_num_good[9] = 10.0

    flagged = [0]
    bad, leaving, marg, drop, rules = _flag_points_for_removal(
        p_valid, pid, n_good, Hdd, pair_good, p_num_good, p_last_res,
        host_flagged, flagged, cfg)

    assert not (bad[0] | leaving[0] | drop[0])
    assert bad[1] and drop[1] and not marg[1]
    assert bad[2] and drop[2]
    assert leaving[3] and marg[3]          # rule a + inlier-new + strong H
    assert leaving[4] and marg[4]          # rule b
    assert leaving[5] and marg[5]          # rule c
    assert not leaving[6]                  # rule c gated by n_res >= 2
    assert leaving[7] and drop[7] and not marg[7]   # not inlier-new
    assert leaving[8] and drop[8] and not marg[8]   # weak hessian
    # rule a fires regardless of lane-9's lower lifetime? DSO requires
    # numGoodResiduals > mgr+10 = 14; lane 9 has 10 -> must NOT fire
    assert not leaving[9]

    # rule attribution (PARITY quantification): lanes 1+2 bad; lane 3 via
    # support concentration; lanes 4,7,8 via newest-OOB; lane 5 via
    # two-outliers; none host-leaving
    assert rules == {"bad": 2, "support_concentration": 1, "newest_oob": 3,
                     "two_outliers": 1, "host_leaving": 0}

    # host-flagged points always leave (existing policy)
    host_flagged[0] = True
    _, leaving2, marg2, _, rules2 = _flag_points_for_removal(
        p_valid, pid, n_good, Hdd, pair_good, p_num_good, p_last_res,
        host_flagged, flagged, cfg)
    assert leaving2[0] and marg2[0]
    assert rules2["host_leaving"] == 1


def test_device_allocator_matches_host_reference():
    """_allocate_candidates (device) must reproduce the former host greedy
    allocator bit-for-bit: slots ascending; own free segment rows first
    (ascending), then overflow rows (ascending), capped by pool capacity;
    accepted-but-unplaced candidates not consumed; drops always consumed."""
    from direct_stereo_slam_tpu.models.frontend import _allocate_candidates

    rng = np.random.RandomState(0)
    S, BUD, NI, P = 6, 16, 40, 20
    B = S * P
    for trial in range(8):
        ok = rng.rand(S, BUD) < rng.uniform(0.05, 0.9)
        # realistic lane maps: prefix of a per-slot permutation
        lane = np.stack([rng.permutation(NI)[:BUD] for _ in range(S)])
        drop = rng.rand(S, NI) < 0.2
        p_valid = rng.rand(B) < rng.uniform(0.3, 0.98)
        participate = rng.rand(S) < 0.8

        # ---- host reference (the pre-r3 loop) --------------------------
        free = ~p_valid.copy()
        n_fill = 0
        h_src_slot = np.zeros(B, np.int32); h_sub = np.zeros(B, np.int32)
        h_lane = np.zeros(B, np.int32); h_dst = np.zeros(B, np.int32)
        h_host = np.zeros(B, np.int32); h_valid = np.zeros(B, bool)
        h_cons = np.zeros((S, NI), bool)
        for s in range(S):
            if not participate[s]:
                continue
            oks = ok[s]
            h_cons[s] = drop[s]
            if not oks.any():
                continue
            own = np.nonzero(free[s * P:(s + 1) * P])[0] + s * P
            other = np.nonzero(free)[0]
            other = other[(other < s * P) | (other >= (s + 1) * P)]
            seg_free = np.concatenate([own, other])
            k = min(len(seg_free), int(oks.sum()), B - n_fill)
            if k <= 0:
                continue
            free[seg_free[:k]] = False
            sl = slice(n_fill, n_fill + k)
            taken_sub = np.nonzero(oks)[0][:k]
            taken = lane[s][taken_sub]
            h_src_slot[sl] = s; h_sub[sl] = taken_sub; h_lane[sl] = taken
            h_dst[sl] = seg_free[:k]; h_host[sl] = s
            h_valid[sl] = True
            n_fill += k
            h_cons[s, taken] = True

        d = _allocate_candidates(
            jnp.asarray(ok), jnp.asarray(lane.astype(np.int32)),
            jnp.asarray(drop), jnp.asarray(p_valid),
            jnp.asarray(participate), P)
        d_src_slot, d_sub, d_lane, d_dst, d_host, d_valid, d_cons = map(
            np.asarray, d)
        np.testing.assert_array_equal(d_valid, h_valid, err_msg=f"t{trial}")
        m = h_valid
        np.testing.assert_array_equal(d_src_slot[m], h_src_slot[m])
        np.testing.assert_array_equal(d_sub[m], h_sub[m])
        np.testing.assert_array_equal(d_lane[m], h_lane[m])
        np.testing.assert_array_equal(d_dst[m], h_dst[m])
        np.testing.assert_array_equal(d_host[m], h_host[m])
        np.testing.assert_array_equal(d_cons, h_cons, err_msg=f"t{trial}")
