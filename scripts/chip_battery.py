"""Chip battery: isolated per-program timings + dispatch diagnostics on
the REAL attached TPU (the r3 round lost this file to /tmp; VERDICT r4
item 2 requires it committed).

Measures, each with block_until_ready and warm compiles:

0. dispatch diagnostics — per-dispatch overhead of a trivial program,
   async-queue drain rate, RTT of a blocking pull (distinguishes "device
   is slow" from "tunnel dispatch serializes" on a degraded day);
1. hot-path single-frame program (pyramid + coarse-to-fine track);
2. trace_points_all at frontend shapes ([S=8, NI=1024], 64-step grid);
3. BA: linearize alone, and optimize at iterations 1/2/4/6;
4. activation chain (_gate_compact_activate shapes);
5. template build;
6. pipelined on/off e2e A/B (40 synthetic frames, SLAMNode);
7. folded vs vmap batch tracking at B in {8, 16, 32}.

Prints one JSON line per section (streaming; resilient to timeouts).
Run:  python scripts/chip_battery.py [section ...]   (default: all)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(section, **kw):
    print(json.dumps({"section": section, **kw}), flush=True)


def _t(fn, n=20, warm=2):
    for _ in range(warm):
        out = fn()
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return 1000.0 * (time.perf_counter() - t0) / n


def diag_dispatch(jax):
    """Per-dispatch overhead + blocking RTT on the attached device."""
    import jax.numpy as jnp
    x = jnp.ones((8, 128), jnp.float32)
    tiny = jax.jit(lambda a: a + 1.0)
    tiny(x).block_until_ready()

    # async queue drain: N dispatches, one block at the end
    for n in (1, 10, 50):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = tiny(y)
        y.block_until_ready()
        emit("dispatch", mode=f"async_chain_{n}",
             ms_total=round(1000 * (time.perf_counter() - t0), 2),
             ms_per_dispatch=round(1000 * (time.perf_counter() - t0) / n, 2))

    # blocking RTT: device_get of a scalar, 10x
    s = jnp.float32(1.0) + 0.0
    s.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        float(jax.device_get(s))
    emit("dispatch", mode="blocking_pull_rtt",
         ms=round(100.0 * (time.perf_counter() - t0), 2))

    # sustained big matmul (device health): 2048^2 bf16 matmul
    a = jnp.ones((2048, 2048), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    ms = _t(lambda: mm(a), n=30)
    # 2*2048^3 flops / time
    emit("dispatch", mode="matmul_2048_bf16", ms=round(ms, 3),
         tflops=round(2 * 2048**3 / (ms / 1000) / 1e12, 2))


def _build_hot(jax):
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.config import make_config
    from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
    from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset

    W, H, LVLS = 1232, 368, 5
    ds = SyntheticStereoDataset(n_frames=3, width=W, height=H, speed=0.4)
    cfg = make_config(W, H, preset=0, mode=1)
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, LVLS)
    return ds, cfg, intr, W, H, LVLS


def bench_track(jax):
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.models.depth_template import (
        build_template, default_budgets)
    from direct_stereo_slam_tpu.models.tracker import AffLight, track_candidate
    from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

    ds, cfg, intr, W, H, LVLS = _build_hot(jax)
    f0, f1 = ds.frame(0), ds.frame(1)
    rng = np.random.RandomState(0)
    N = 2000
    us = rng.uniform(3, W - 4, N).astype(np.float32)
    vs = rng.uniform(3, H - 4, N).astype(np.float32)
    depth = np.asarray(f0["depth0"])[vs.astype(int), us.astype(int)]
    tmpl = build_template(jnp.asarray(us), jnp.asarray(vs),
                          jnp.asarray(1.0 / depth),
                          jnp.ones(N, jnp.float32), f0["img0"], LVLS,
                          default_budgets(W, H, LVLS))
    zero = AffLight(jnp.float32(0.0), jnp.float32(0.0))
    one = jnp.float32(1.0)

    pyr_only = jax.jit(lambda img: build_pyramid(img, LVLS))

    @jax.jit
    def frame_step(img, T0):
        pyr = build_pyramid(img, LVLS)
        return track_candidate(tuple(pyr.data), tmpl, intr, cfg, T0,
                               zero, zero, one, one)

    # pre-commit the image to the device: the section measures device
    # compute, not the tunnel's ~40 ms host->device image transfer
    img = jax.device_put(jnp.asarray(f1["img0"]))
    img.block_until_ready()
    T0 = jnp.eye(4)
    emit("track", pyramid_ms=round(_t(lambda: pyr_only(img)), 3),
         frame_step_ms=round(_t(lambda: frame_step(img, T0)), 3))


def bench_trace(jax):
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.models import immature
    from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

    ds, cfg, intr, W, H, LVLS = _build_hot(jax)
    f0, f1 = ds.frame(0), ds.frame(1)
    pyr = build_pyramid(f1["img0"], LVLS)
    planes = pyr.data[0]
    S = cfg.ba.max_frames + 1
    NI = cfg.ba.max_immature_per_frame

    # realistic candidate sets: select on the real image
    from direct_stereo_slam_tpu.ops.select import make_selection_map
    pyr0 = build_pyramid(f0["img0"], LVLS)
    sel, _ = make_selection_map(
        pyr0.abs_grad[0], pyr0.abs_grad[1], pyr0.abs_grad[2], 3, cfg)
    pts1 = immature.create_points(pyr0.data[0], sel, NI)
    batch = immature.empty_batch(S, NI)
    for s in range(S):
        batch = immature.set_slot(batch, s, pts1)

    K = np.asarray(ds.K)
    Ki = np.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.2
    KRKi = jnp.asarray(np.tile((K @ T[:3, :3] @ Ki)[None], (S, 1, 1)),
                       jnp.float32)
    Kt = jnp.asarray(np.tile((K @ T[:3, 3])[None], (S, 1)), jnp.float32)
    ones = jnp.ones((S,), jnp.float32)
    zeros = jnp.zeros((S,), jnp.float32)

    ms_fresh = _t(lambda: immature.trace_points_all(
        batch, planes, KRKi, Kt, ones, zeros, cfg), n=10)

    # converged regime: run one trace, then re-trace the updated batch
    batch2 = immature.trace_points_all(batch, planes, KRKi, Kt, ones, zeros,
                                       cfg)
    ms_conv = _t(lambda: immature.trace_points_all(
        batch2, planes, KRKi, Kt, ones, zeros, cfg), n=10)

    # compacted form (the production path): search-needing lanes only
    ms_c_fresh = _t(lambda: immature.trace_points_all_compact(
        batch, planes, KRKi, Kt, ones, zeros, cfg), n=10)
    ms_c_conv = _t(lambda: immature.trace_points_all_compact(
        batch2, planes, KRKi, Kt, ones, zeros, cfg), n=10)
    _, n_search, n_over = immature.trace_points_all_compact(
        batch2, planes, KRKi, Kt, ones, zeros, cfg)

    # steady-state tier (r4): short-reach small program
    tc = cfg.trace
    ms_steady = _t(lambda: immature.trace_points_all_compact(
        batch2, planes, KRKi, Kt, ones, zeros, cfg,
        tc.steady_num_steps, tc.steady_budget, tc.steady_max_reach), n=10)
    _, ns_s, nov_s = immature.trace_points_all_compact(
        batch2, planes, KRKi, Kt, ones, zeros, cfg,
        tc.steady_num_steps, tc.steady_budget, tc.steady_max_reach)
    emit("trace", S=S, NI=NI, fresh_ms=round(ms_fresh, 3),
         converged_ms=round(ms_conv, 3),
         compact_fresh_ms=round(ms_c_fresh, 3),
         compact_converged_ms=round(ms_c_conv, 3),
         compact_budget=cfg.trace.search_budget,
         converged_n_search=int(n_search), converged_overflow=int(n_over),
         steady_ms=round(ms_steady, 3),
         steady_shape=[tc.steady_budget, tc.steady_num_steps],
         steady_overflow=int(nov_s))


def bench_ba(jax):
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.models import ba
    from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

    ds, cfg, intr, W, H, LVLS = _build_hot(jax)
    NS = 8
    NPP = cfg.ba.max_points_per_frame
    state = ba.empty_state(NS, NS * NPP, H, W, np.asarray(
        [ds.K[0, 0], ds.K[1, 1], ds.K[0, 2], ds.K[1, 2]], np.float32))

    rng = np.random.RandomState(0)
    for s in range(NS):
        f = ds.frame(min(s, 2))
        pyr = build_pyramid(f["img0"], LVLS)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = -0.1 * s
        state = ba.add_frame(state, s, s, T, np.zeros(2), 1.0, pyr.data[0])
        us = rng.uniform(3, W - 4, NPP).astype(np.float32)
        vs = rng.uniform(3, H - 4, NPP).astype(np.float32)
        dep = np.asarray(f["depth0"])[vs.astype(int), us.astype(int)]
        from direct_stereo_slam_tpu.ops.interp import bilinear_gather
        from direct_stereo_slam_tpu.config import PATTERN_OFFSETS
        du = np.asarray([o[0] for o in PATTERN_OFFSETS], np.float32)
        dv = np.asarray([o[1] for o in PATTERN_OFFSETS], np.float32)
        color = bilinear_gather(
            pyr.data[0], jnp.asarray(us[:, None] + du),
            jnp.asarray(vs[:, None] + dv))[..., 0]
        state = ba.add_points(
            state, jnp.arange(NPP) + s * NPP, s,
            jnp.asarray(us), jnp.asarray(vs), jnp.asarray(1.0 / dep),
            color, jnp.ones((NPP, 8), jnp.float32),
            jnp.ones(NPP, bool))

    lin_ms = _t(lambda: ba.linearize(state, cfg), n=10)
    out = {"linearize_ms": round(lin_ms, 3)}
    for it in (1, 2, 4, 6):
        ms = _t(lambda it=it: ba.optimize(state, cfg, it)[0].delta, n=5)
        out[f"optimize_{it}it_ms"] = round(ms, 3)
    # compacted keyframe chain (r4): valid-row view at cfg.ba.compact_budget
    cb = cfg.ba.compact_budget
    if 0 < cb < state.num_points:
        ms = _t(lambda: ba.optimize_keyframe(
            state, cfg, 6, jnp.int32(NS - 1), cb)[0].delta, n=5)
        out["optimize_kf_6it_compact_ms"] = round(ms, 3)
        out["compact_budget"] = cb
    ms = _t(lambda: ba.optimize_keyframe(
        state, cfg, 6, jnp.int32(NS - 1), None)[0].delta, n=5)
    out["optimize_kf_6it_full_ms"] = round(ms, 3)
    emit("ba", NS=NS, NP=NS * NPP, **out)
    bench_ba.last = (state, cfg, intr, W, H, LVLS)


def bench_template(jax):
    """Per-KF template chain: ba.template_inputs + build_template (the
    'template' stage, 64.6 ms/event sync in BENCH_local_r3a)."""
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.models import ba
    from direct_stereo_slam_tpu.models.depth_template import (
        build_template, default_budgets)
    from direct_stereo_slam_tpu.ops.pyramid import build_pyramid

    state, cfg, intr, W, H, LVLS = bench_ba.last
    budgets = default_budgets(W, H, LVLS)
    img = build_pyramid(
        jax.device_put(jnp.zeros((H, W), jnp.float32)), LVLS).data[0][..., 0]

    ti_ms = _t(lambda: ba.template_inputs(state, cfg, jnp.int32(0)), n=10)
    ti = ba.template_inputs(state, cfg, jnp.int32(0))

    bt = jax.jit(lambda ti: build_template(
        ti[0], ti[1], ti[2], ti[3], img, LVLS, budgets, valid=ti[4]))
    bt_ms = _t(lambda: bt(ti), n=10)
    emit("template", template_inputs_ms=round(ti_ms, 3),
         build_template_ms=round(bt_ms, 3))


def bench_activate(jax):
    """Per-KF activation chain (_gate_compact_activate + allocator +
    insert), at frontend shapes; 92.8 ms/event sync in BENCH_local_r3a."""
    import jax.numpy as jnp
    from direct_stereo_slam_tpu.models import ba, immature
    from direct_stereo_slam_tpu.models.frontend import (
        _allocate_candidates, _gate_compact_activate, _halfres_distance_map,
        _insert_candidates_all)
    from direct_stereo_slam_tpu.ops.pyramid import build_pyramid
    from direct_stereo_slam_tpu.ops.select import make_selection_map

    state, cfg, intr, W, H, LVLS = bench_ba.last
    ds, _, _, _, _, _ = _build_hot(jax)
    S = cfg.ba.max_frames + 1
    NI = cfg.ba.max_immature_per_frame
    f0 = ds.frame(0)
    pyr0 = build_pyramid(jax.device_put(f0["img0"]), LVLS)
    sel, _ = make_selection_map(
        pyr0.abs_grad[0], pyr0.abs_grad[1], pyr0.abs_grad[2], 3, cfg)
    pts = immature.create_points(pyr0.data[0], sel, NI)
    # traced-interval candidates so the gates pass realistically
    pts = pts._replace(
        idepth_min=jnp.maximum(pts.idepth_min, 0.05),
        idepth_max=jnp.full((NI,), 0.4, jnp.float32),
        status=jnp.full((NI,), immature.IPS_GOOD, jnp.int32))
    batch = immature.empty_batch(S, NI)
    for s in range(S - 1):
        batch = immature.set_slot(batch, s, pts)

    K1 = jnp.asarray(np.asarray(intr.K(1)), jnp.float32)
    h2, w2 = intr.h[1], intr.w[1]
    dist_map = _halfres_distance_map(state, jnp.int32(S - 1), K1, h2, w2)
    KRKi1 = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (S, 1, 1))
    Kt1 = jnp.tile(jnp.asarray([[0.2, 0.0, 0.0]], jnp.float32), (S, 1))
    hf = jnp.zeros(S, bool)
    views = ba.current_views(state)

    def chain():
        ok, idep, lane, drop = _gate_compact_activate(
            batch, dist_map, KRKi1, Kt1, jnp.float32(2.0), hf,
            state.images, state.frame_valid, views[0], views[1], views[2],
            state.exposure, cfg, w2, h2, cfg.ba.act_budget)
        part = jnp.ones(S, bool)
        alloc = _allocate_candidates(ok, lane, drop, state.p_valid, part,
                                     cfg.ba.max_points_per_frame)
        st2 = _insert_candidates_all(state, batch, idep, alloc[0], alloc[1],
                                     alloc[2], alloc[3], alloc[5], alloc[4])
        return st2.p_valid

    dm_ms = _t(lambda: _halfres_distance_map(
        state, jnp.int32(S - 1), K1, h2, w2), n=10)
    emit("activate", dist_map_ms=round(dm_ms, 3),
         chain_ms=round(_t(chain, n=10), 3),
         act_budget=cfg.ba.act_budget)


def bench_e2e_ab(jax, n_frames=40):
    import dataclasses
    from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
    from direct_stereo_slam_tpu.runtime.node import SLAMNode
    from direct_stereo_slam_tpu.utils.timing import StageTimers

    ds, cfg, intr, W, H, LVLS = _build_hot(jax)
    ds = SyntheticStereoDataset(n_frames=n_frames, width=W, height=H,
                                speed=0.4)
    dev = jax.devices()[0]
    frames = [(jax.device_put(f["img0"], dev), jax.device_put(f["img1"], dev),
               float(f["timestamp"]))
              for f in (ds.frame(i) for i in range(n_frames))]
    jax.block_until_ready(frames[-1][0])

    for pipelined in (False, True):
        c = cfg.replace(runtime=dataclasses.replace(
            cfg.runtime, pipelined_tracking=pipelined))

        def run():
            node = SLAMNode(c, intr, intr, ds.t_cam1_cam0)
            node.timers = node.frontend.timers = StageTimers()
            t0 = time.perf_counter()
            for img0, img1, ts in frames:
                node.process(img0, img1, ts)
            node.finish()
            return time.perf_counter() - t0

        run()              # cold
        dts = [run(), run()]
        emit("e2e_ab", pipelined=pipelined,
             fps=round(n_frames / min(dts), 2),
             per_frame_ms=round(1000 * min(dts) / n_frames, 2))


def _needs_ba(fn):
    def wrapped(jax):
        if not hasattr(bench_ba, "last"):
            bench_ba(jax)
        return fn(jax)
    return wrapped


SECTIONS = {
    "dispatch": diag_dispatch,
    "track": bench_track,
    "trace": bench_trace,
    "ba": bench_ba,
    "template": _needs_ba(bench_template),
    "activate": _needs_ba(bench_activate),
    "e2e_ab": bench_e2e_ab,
}


def main():
    import jax
    try:
        # host-keyed like bench._setup_cache so the battery reuses the
        # bench run's compiled programs
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                flags = next(l for l in f if l.startswith("flags"))
            suffix = "_" + hashlib.md5(flags.encode()).hexdigest()[:8]
        except Exception:
            suffix = ""
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/dsslam_jax_cache" + suffix)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    names = sys.argv[1:] or list(SECTIONS)
    emit("env", devices=[str(d) for d in jax.devices()])
    for name in names:
        try:
            SECTIONS[name](jax)
        except Exception as e:
            emit(name, error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
