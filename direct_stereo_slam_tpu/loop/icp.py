"""Point-to-point ICP fallback.

Equivalent of the reference's PCL ICP wrapper (pose_estimation/icp.h:44-71):
max 5 iterations, 2 m correspondence distance, accept if mean-squared
correspondence distance (PCL getFitnessScore) < 1.5. The PCL KD-tree
becomes a brute-force nearest neighbor (scans are ~1-4k points: a [N, M]
distance matrix is a single matmul-sized op), and the per-iteration rigid
update is a closed-form Kabsch solve."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _kabsch(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Best-fit rigid transform mapping src -> dst (equal-length [K, 3])."""
    cs = src.mean(axis=0)
    cd = dst.mean(axis=0)
    H = (src - cs).T @ (dst - cd)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = cd - R @ cs
    return T


def icp(
    pts_source: np.ndarray,        # [N, 3] (matched frame's scan)
    pts_target: np.ndarray,        # [M, 3] (current frame's scan)
    tfm_target_source: np.ndarray, # [4, 4] initial guess
    max_iterations: int = 5,
    max_corr_dist: float = 2.0,
    transformation_eps: float = 0.01,
    fitness_thres: float = 1.5,
) -> Tuple[bool, np.ndarray, float]:
    """Returns (accepted, refined tfm_target_source, fitness)."""
    if len(pts_source) < 10 or len(pts_target) < 10:
        return False, tfm_target_source, float("inf")

    T = np.asarray(tfm_target_source, np.float64).copy()
    src = pts_source @ T[:3, :3].T + T[:3, 3]

    for _ in range(max_iterations):
        d2 = ((src[:, None, :] - pts_target[None, :, :]) ** 2).sum(-1)
        nn = np.argmin(d2, axis=1)
        nnd = np.sqrt(d2[np.arange(len(src)), nn])
        ok = nnd < max_corr_dist
        if ok.sum() < 10:
            break
        dT = _kabsch(src[ok], pts_target[nn[ok]])
        src = src @ dT[:3, :3].T + dT[:3, 3]
        T = dT @ T
        if np.linalg.norm(dT[:3, 3]) + np.linalg.norm(dT[:3, :3] - np.eye(3)) < transformation_eps:
            break

    # PCL getFitnessScore: mean squared distance of correspondences within
    # the (default: max) range
    d2 = ((src[:, None, :] - pts_target[None, :, :]) ** 2).sum(-1)
    nnd2 = d2.min(axis=1)
    fitness = float(nnd2.mean())
    return fitness < fitness_thres, T, fitness
