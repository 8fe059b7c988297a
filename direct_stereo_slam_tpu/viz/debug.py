"""Per-keyframe debug image dumps.

Runtime equivalents of the reference's online debug rendering: idepth jet
maps pushed to the viewer (TrackerAndScaler.cpp:338-449) and optional PNG
dumps (TAS.cpp:432-437). Enabled with cfg.runtime.debug_dump_dir; each new
keyframe writes ``kf_<id>_idepth.png`` (jet-colored template inverse depth
over the keyframe image)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .export import depth_image_png


def dump_template_idepth(out_dir: str, kf_id: int, template, pyr0,
                         prefix: str = "kf"):
    """Scatter the level-0 tracker template into a sparse idepth map and
    write the jet overlay (the reference's KF depth-image pane)."""
    import jax

    pu, pv, pid, mask = jax.device_get((
        template.pu[0], template.pv[0], template.pid[0], template.pmask[0]))
    img = np.asarray(pyr0.data[0][..., 0]) if pyr0 is not None else None
    h, w = (img.shape if img is not None
            else (int(pv.max()) + 2, int(pu.max()) + 2))
    idepth = np.zeros((h, w), np.float32)
    u = np.clip(np.round(pu).astype(int), 0, w - 1)
    v = np.clip(np.round(pv).astype(int), 0, h - 1)
    sel = mask & (pid > 0)
    idepth[v[sel], u[sel]] = pid[sel]
    # 2x2 dilation so single pixels are visible at full resolution
    d = np.maximum.reduce([
        idepth,
        np.roll(idepth, 1, 0), np.roll(idepth, 1, 1),
        np.roll(np.roll(idepth, 1, 0), 1, 1),
    ])
    os.makedirs(out_dir, exist_ok=True)
    depth_image_png(os.path.join(out_dir, f"{prefix}_{kf_id:05d}_idepth.png"),
                    d, image=img)
