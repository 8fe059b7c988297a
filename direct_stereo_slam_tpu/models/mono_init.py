"""Monocular bootstrap initializer.

Parity component for DSO's ``CoarseInitializer`` (external; reference call
sites FrontEnd.cpp:607-623, 842-934): two-frame direct alignment that
jointly optimizes the relative pose, affine brightness and a per-point
inverse-depth field, coarse-to-fine, with an "alpha" prior pulling idepths
toward 1 until the baseline is large enough ("snapped"), after which the
prior releases and depth converges from parallax. The stereo initializer
(models/initializer.py) is the default for stereo rigs — it is metric and
single-frame; this module covers mono-only operation.

TPU design: one fixed point set from the level-0 selector, tracked over all
pyramid levels with scaled coordinates (replacing DSO's per-level point
hierarchies + KNN regularization graph with the alpha prior + multi-frame
iteration); per-point idepth eliminated by Schur complement each GN step,
everything inside one jitted program per level.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from ..geometry import lie
from ..geometry.camera import PyramidIntrinsics
from ..ops.interp import bilinear_gather
from ..ops.pyramid import Pyramid
from ..ops.select import make_selection_map

_HI = jax.lax.Precision.HIGHEST


class MonoInitState(NamedTuple):
    u: jnp.ndarray          # [N] level-0 pixel coords in the first frame
    v: jnp.ndarray
    color: jnp.ndarray      # [N] level-0 intensity
    idepth: jnp.ndarray     # [N]
    valid: jnp.ndarray      # [N]
    knn: jnp.ndarray        # [N, K] image-plane nearest-neighbor indices
    T: jnp.ndarray          # [4, 4] first-to-current estimate
    snapped: jnp.ndarray    # bool
    snapped_count: jnp.ndarray  # frames tracked since snap


def create(pyr0: Pyramid, cfg: SLAMConfig, budget: int = 1024, pot: int = 6) -> MonoInitState:
    sel, _ = make_selection_map(
        pyr0.abs_grad[0], pyr0.abs_grad[1], pyr0.abs_grad[2], pot, cfg)
    H, W = sel.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    good = (sel > 0) & (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    flat = good.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=budget, fill_value=0)
    count = jnp.sum(flat)
    lane_ok = jnp.arange(budget) < count
    u = (idx % W).astype(jnp.float32)
    v = (idx // W).astype(jnp.float32)
    color = pyr0.data[0][..., 0].reshape(-1)[idx]
    # fixed image-plane KNN graph (DSO CoarseInitializer::makeNN, 10
    # neighbors): invalid lanes and invalid neighbors resolve to self so
    # the coupling term is inert for them
    K_NN = 10
    d2 = (u[:, None] - u[None, :]) ** 2 + (v[:, None] - v[None, :]) ** 2
    d2 = jnp.where(lane_ok[None, :], d2, jnp.inf)
    d2 = d2.at[jnp.arange(budget), jnp.arange(budget)].set(jnp.inf)
    _, knn = jax.lax.top_k(-d2, K_NN)
    self_idx = jnp.broadcast_to(jnp.arange(budget)[:, None], (budget, K_NN))
    nb_ok = lane_ok[knn] & lane_ok[:, None]
    knn = jnp.where(nb_ok, knn, self_idx)
    return MonoInitState(
        u=u, v=v, color=color,
        idepth=jnp.ones(budget, jnp.float32),
        valid=lane_ok,
        knn=knn,
        T=jnp.eye(4, dtype=jnp.float32),
        snapped=jnp.bool_(False),
        snapped_count=jnp.int32(0),
    )


def _level_pass(img_l, ref_col, pu, pv, pid, pmask, Ki, fx, fy, cx, cy,
                T, aff, alpha_w, huber, iR=None, coup_w=0.0):
    """Residual + blocks for the joint (pose8, idepth[N]) system at one
    level. Returns (E, n, Hpp [8,8], bp [8], Hpd [N,8], Hdd [N], bd [N])."""
    Hh, Ww, _ = img_l.shape
    R = T[:3, :3]
    t = T[:3, 3]
    RKi = jnp.matmul(R, Ki, precision=_HI)
    xyz = jnp.stack([pu, pv, jnp.ones_like(pu)], -1)
    Kx = jnp.matmul(xyz, RKi.T, precision=_HI)
    pt = Kx + t[None, :] * pid[:, None]
    z = pt[:, 2]
    un = pt[:, 0] / z
    vn = pt[:, 1] / z
    Ku = fx * un + cx
    Kv = fy * vn + cy
    new_id = pid / z
    ok = pmask & (Ku > 2) & (Kv > 2) & (Ku < Ww - 3) & (Kv < Hh - 3) & (new_id > 0)
    hit = bilinear_gather(img_l, Ku, Kv)
    r = hit[:, 0] - (aff[0] * ref_col + aff[1])
    hw = jnp.where(jnp.abs(r) < huber, 1.0, huber / jnp.maximum(jnp.abs(r), 1e-9))
    w = jnp.where(ok, hw, 0.0)

    gx = hit[:, 1] * fx
    gy = hit[:, 2] * fy
    Jp = jnp.stack([
        new_id * gx,
        new_id * gy,
        -new_id * (un * gx + vn * gy),
        -(un * vn * gx + (1 + vn * vn) * gy),
        un * vn * gy + (1 + un * un) * gx,
        un * gy - vn * gx,
        -ref_col * jnp.ones_like(un),   # d r/d a (simple affine model a*I+b)
        -jnp.ones_like(un),
    ], -1)                               # [N, 8]
    # d(pt)/d id = t  =>  du_n/d id = (t0 - un t2)/z, dv_n/d id = (t1 - vn t2)/z
    Jd = gx * (t[0] - un * t[2]) / z + gy * (t[1] - vn * t[2]) / z

    E = jnp.sum(w * r * r) + alpha_w * jnp.sum(
        jnp.where(pmask, (pid - 1.0) ** 2, 0.0))
    n = jnp.sum(ok.astype(jnp.float32))
    Hpp = jnp.matmul((Jp * w[:, None]).T, Jp, precision=_HI)
    bp = jnp.matmul((Jp * w[:, None]).T, r[:, None], precision=_HI)[:, 0]
    Hpd = Jp * (w * Jd)[:, None]        # [N, 8] coupling rows
    Hdd = w * Jd * Jd + alpha_w
    bd = w * Jd * r + alpha_w * (pid - 1.0)
    if iR is not None:
        # KNN regularization toward the neighbor median iR (DSO
        # CoarseInitializer couplingWeight term, applied post-snap; iR is
        # held constant within an iteration like DSO's optReg)
        E = E + coup_w * jnp.sum(jnp.where(pmask, (pid - iR) ** 2, 0.0))
        Hdd = Hdd + coup_w
        bd = bd + coup_w * (pid - iR)
    return E, n, Hpp, bp, Hpd, Hdd, bd


@partial(jax.jit, static_argnums=(2, 3))
def track_frame(
    state: MonoInitState,
    pyr_new_data: Tuple[jnp.ndarray, ...],
    intr: PyramidIntrinsics,
    cfg: SLAMConfig,
) -> MonoInitState:
    """One frame of initializer tracking (CoarseInitializer::trackFrame)."""
    levels = len(pyr_new_data)
    huber = cfg.tracker.huber_th
    T = state.T
    pid = state.idepth
    aff = jnp.array([1.0, 0.0], jnp.float32)
    alpha_w = jnp.where(state.snapped, 0.0, 150.0 * 150.0 / state.u.shape[0])
    # neighbor coupling replaces the alpha prior after the snap. Weight
    # swept on the synthetic lateral-motion benchmark: idepth-structure
    # IQR spread 6.6 (no coupling) -> 5.2 (w=10) -> 4.3 (w=50) -> 3.3
    # (w=200), but beyond ~50 the recovered translation direction starts
    # leaking into y (the mono tilt ambiguity absorbs the smoothing
    # pressure); 50 is the knee that keeps the pose intact.
    coup_w = jnp.where(state.snapped, jnp.float32(50.0), jnp.float32(0.0))

    for lvl in range(levels - 1, -1, -1):
        s = float(1 << lvl)
        pu = (state.u + 0.5) / s - 0.5
        pv = (state.v + 0.5) / s - 0.5
        Ki = jnp.asarray(intr.Ki(lvl), jnp.float32)
        args = (pyr_new_data[lvl], state.color, pu, pv)
        fx, fy, cx, cy = intr.fx[lvl], intr.fy[lvl], intr.cx[lvl], intr.cy[lvl]

        def energy_of(T_, pid_, aff_):
            iR_ = jnp.median(pid_[state.knn], axis=1)
            E, n, *_ = _level_pass(
                args[0], args[1], args[2], args[3], pid_, state.valid,
                Ki, fx, fy, cx, cy, T_, aff_, alpha_w, huber,
                iR=iR_, coup_w=coup_w)
            return E, n

        def gn_iter(_, carry):
            T, pid, aff, lam, E_old = carry
            iR = jnp.median(pid[state.knn], axis=1)
            E, n, Hpp, bp, Hpd, Hdd, bd = _level_pass(
                args[0], args[1], args[2], args[3], pid, state.valid,
                Ki, fx, fy, cx, cy, T, aff, alpha_w, huber,
                iR=iR, coup_w=coup_w)
            inv_Hdd = 1.0 / jnp.maximum(Hdd * (1 + lam), 1e-6)
            H_sc = Hpp - jnp.matmul(Hpd.T * inv_Hdd[None, :], Hpd, precision=_HI)
            b_sc = bp - jnp.matmul(Hpd.T, (inv_Hdd * bd)[:, None], precision=_HI)[:, 0]
            H_sc = H_sc + lam * jnp.diag(jnp.diag(H_sc)) + 1e-6 * jnp.eye(8)
            x = jnp.linalg.solve(H_sc, -b_sc)
            xd = inv_Hdd * (-bd - jnp.matmul(Hpd, x[:, None], precision=_HI)[:, 0])
            T_new = jnp.matmul(lie.se3_exp(x[:6]), T, precision=_HI)
            aff_new = aff + x[6:8] * jnp.array([0.01, 1.0])
            pid_new = jnp.clip(pid + xd, 1e-3, 50.0)
            E_new, n_new = energy_of(T_new, pid_new, aff_new)
            # LM accept gate (with a surviving-count guard, as in the BA)
            accept = (E_new < E_old) & (n_new > 0.5 * jnp.maximum(n, 1.0))
            sel = lambda a, b: jnp.where(accept, a, b)
            return (
                sel(T_new, T),
                jnp.where(accept, pid_new, pid),
                sel(aff_new, aff),
                jnp.where(accept, lam * 0.5, jnp.minimum(lam * 4.0, 1e3)),
                jnp.where(accept, E_new, E_old),
            )

        E0, _ = energy_of(T, pid, aff)
        T, pid, aff, _, _ = jax.lax.fori_loop(
            0, 6 if lvl > 0 else 10, gn_iter,
            (T, pid, aff, jnp.float32(0.1), E0))

    # snap detection: enough translation AND a healthy photometric fit
    # (snapping on a diverged pose releases the alpha prior onto garbage)
    E_fin, n_fin = energy_of(T, pid, aff)
    mean_r2 = E_fin / jnp.maximum(n_fin, 1.0)
    snapped = state.snapped | (
        (jnp.linalg.norm(T[:3, 3]) > 0.12) & (mean_r2 < 150.0)
        & (n_fin > 0.3 * state.u.shape[0]))
    snapped_count = jnp.where(snapped, state.snapped_count + 1, 0)
    return state._replace(T=T, idepth=pid, snapped=snapped,
                          snapped_count=snapped_count)


def is_done(state: MonoInitState) -> bool:
    """DSO: initialize after tracking 5+ frames past the snap."""
    return bool(state.snapped) and int(state.snapped_count) >= 5


def to_points(state: MonoInitState):
    """Rescale to mean idepth 1 (the reference's monocular-arbitrary scale,
    FrontEnd.cpp:863-868) and emit (u, v, idepth, rescaled pose)."""
    m = np.asarray(state.valid)
    pid = np.asarray(state.idepth)
    rescale = 1.0 / max(float(pid[m].mean()), 1e-6)
    T = np.asarray(state.T).copy()
    T[:3, 3] /= rescale          # first-to-new with rescaled translation
    return (
        np.asarray(state.u)[m], np.asarray(state.v)[m], pid[m] * rescale,
        T, rescale,
    )
