"""Image undistortion: photometric correction + geometric remap.

Replaces DSO's ``Undistort::undistort<uchar>`` + ``photometricUndist``
(reference call sites main.cpp:249-255). Photometric: gamma inversion via
the 256-entry Binv LUT and optional vignette division; geometric: bilinear
remap through the rectification grids from utils.calib.

Runs on device as one jitted program per camera (LUT gather + bilinear
remap are cheap VPU work; doing it on-device keeps the host->device
transfer to the raw uint8 image).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import bilinear_take_plane


@partial(jax.jit, static_argnums=(3,))
def undistort_image(
    raw: jnp.ndarray,                      # [H_in, W_in] uint8 or float
    remap_x: Optional[jnp.ndarray],        # [H_out, W_out] or None
    remap_y: Optional[jnp.ndarray],
    has_remap: bool,
    binv_lut: Optional[jnp.ndarray] = None,   # [256] photometric inverse response
    inv_vignette: Optional[jnp.ndarray] = None,  # [H_in, W_in] 1/V
) -> jnp.ndarray:
    """Returns float32 [H_out, W_out] irradiance-corrected image."""
    img = raw.astype(jnp.float32)
    if binv_lut is not None:
        idx = jnp.clip(img, 0.0, 255.0)
        lo = jnp.floor(idx).astype(jnp.int32)
        frac = idx - lo
        lut = binv_lut
        img = lut[lo] * (1.0 - frac) + lut[jnp.clip(lo + 1, 0, 255)] * frac
    if inv_vignette is not None:
        img = img * inv_vignette
    if has_remap:
        out = bilinear_take_plane(img, remap_x, remap_y)
        out = jnp.where(remap_x < 0, 0.0, out)
        return out
    return img


class Undistorter:
    """Host-side wrapper holding device-resident remap grids and LUTs."""

    def __init__(self, rect_cam, binv: Optional[np.ndarray] = None,
                 vignette: Optional[np.ndarray] = None):
        self.cam = rect_cam
        self.has_remap = rect_cam.remap_x is not None
        self.remap_x = jnp.asarray(rect_cam.remap_x) if self.has_remap else None
        self.remap_y = jnp.asarray(rect_cam.remap_y) if self.has_remap else None
        self.binv = jnp.asarray(binv) if binv is not None else None
        self.inv_vignette = (
            jnp.asarray(1.0 / np.maximum(vignette, 1e-3)) if vignette is not None else None
        )

    def __call__(self, raw: np.ndarray) -> jnp.ndarray:
        return undistort_image(
            jnp.asarray(raw), self.remap_x, self.remap_y, self.has_remap,
            self.binv, self.inv_vignette,
        )
