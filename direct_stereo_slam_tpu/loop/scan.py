"""Imitated-LiDAR scan generation.

Equivalent of the reference's ``generate_spherical_points``
(loop_detection/generate_spherical_points.h:27-85): maintain a rolling
world point cloud contributed by marginalized keyframes, trim points of
keyframes whose orientation differs too much from the current one, range-
gate, voxel-downsample keeping the highest point per voxel, and emit the
local "scan".

Host-side numpy: the rolling cloud is small (tens of thousands of points),
mutates per keyframe, and sits on the loop thread off the tracking critical
path (SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..geometry import lie


class NearbyPointCloud:
    def __init__(self, cfg):
        self.cfg = cfg
        self.pts: np.ndarray = np.zeros((0, 3), np.float64)   # world points
        self.ids: np.ndarray = np.zeros((0,), np.int64)       # owning kf id
        self.id_pose_wc: Dict[int, np.ndarray] = {}           # kf id -> T_wc

    def add_keyframe_points(self, kf_id: int, T_wc: np.ndarray, pts_world: np.ndarray):
        if len(pts_world):
            self.pts = np.concatenate([self.pts, pts_world], axis=0)
            self.ids = np.concatenate([self.ids, np.full(len(pts_world), kf_id)])
        self.id_pose_wc[kf_id] = np.asarray(T_wc, np.float64)

    def generate_scan(self, T_cw: np.ndarray) -> np.ndarray:
        """Returns the local scan [M, 3] (camera frame) and prunes the
        rolling cloud to the surviving points (reference behavior)."""
        lp = self.cfg.loop
        rng = lp.lidar_range

        # orientation trim (generate_spherical_points.h:34-40). Pure numpy:
        # the eager jnp so3_log here cost ~3 ms PER STORED KEYFRAME per
        # scan (~100 ms/KF at 30 stored ids — the pts_generation line in
        # BENCH r2's stage table before this fix).
        keep_ids = set()
        for kf_id, T_wc in list(self.id_pose_wc.items()):
            delta = T_cw @ T_wc
            w = lie.so3_log_np(delta[:3, :3])
            if np.linalg.norm(w) > self.cfg.loop.orientation_trim_rad:
                del self.id_pose_wc[kf_id]
            else:
                keep_ids.add(kf_id)

        if len(self.pts) == 0:
            return np.zeros((0, 3))

        id_ok = np.isin(self.ids, np.fromiter(keep_ids, np.int64, len(keep_ids)))
        p_local = (self.pts @ T_cw[:3, :3].T) + T_cw[:3, 3]
        in_range = np.linalg.norm(p_local, axis=1) < rng
        ok = id_ok & in_range

        # voxel filter keeping the highest (most negative y = up) point
        rx, ry, rz = lp.voxel_res
        steps = np.array([1.0 / rx, 1.0 / ry, 1.0 / rz])
        vx = np.floor((p_local[:, 0] + rng) * steps[0]).astype(np.int64)
        vy = np.floor((p_local[:, 1] + rng) * steps[1]).astype(np.int64)
        vz = np.floor((p_local[:, 2] + rng) * steps[2]).astype(np.int64)
        nx = int(np.floor(2 * rng * steps[0]) + 1)
        ny = int(np.floor(2 * rng * steps[1]) + 1)
        key = vx + vy * nx + vz * nx * ny
        key = np.where(ok, key, -1)

        # group by voxel, pick the highest point (min y, camera-down) per
        # group: one stable lexsort by (key asc, height desc) + first-of-
        # group mask — O(N log N) vectorized, replacing an interpreted
        # per-point loop that cost O(N) Python bytecode per keyframe
        heights = -p_local[:, 1]
        order = np.lexsort((-heights, key))
        ks = key[order]
        first = np.ones(len(ks), bool)
        first[1:] = ks[1:] != ks[:-1]
        sel_idx = order[first & (ks >= 0)]

        # prune the rolling cloud to the surviving points, and drop pose
        # records of keyframes with no surviving points (otherwise
        # id_pose_wc — and the per-scan orientation-trim loop over it —
        # grows O(total keyframes) on same-heading trajectories)
        self.pts = self.pts[sel_idx]
        self.ids = self.ids[sel_idx]
        live = set(np.unique(self.ids).tolist())
        for kf_id in [k for k in self.id_pose_wc if k not in live]:
            del self.id_pose_wc[kf_id]
        return p_local[sel_idx]
