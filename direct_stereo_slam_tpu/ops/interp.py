"""Bilinear interpolation of (I, dx, dy) planes — the inner-loop gather.

Equivalent of DSO ``getInterpolatedElement33/31`` (reference call sites:
TrackerAndScaler.cpp:790, 1106; PoseEstimator.cpp:237; LoopHandler.cpp:177).

TPU notes: implemented as four XLA gathers over a flattened image with
precomputed linear indices; out-of-bounds lanes are clamped and must be
masked by the caller (the kernels all carry an explicit validity mask).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_gather(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; u, v: [...] pixel coords. Returns [..., C].

    Matches the reference's convention: sample at (u, v) interpolates the
    four pixels (ix, iy), (ix+1, iy), (ix, iy+1), (ix+1, iy+1) with
    fractional weights. Coordinates are clamped; callers mask invalid lanes.
    """
    H, W, C = img.shape
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    fx = (u - ix)[..., None]
    fy = (v - iy)[..., None]

    flat = img.reshape(H * W, C)
    base = iy * W + ix
    p00 = flat[base]
    p10 = flat[base + 1]
    p01 = flat[base + W]
    p11 = flat[base + W + 1]

    top = p00 * (1.0 - fx) + p10 * fx
    bot = p01 * (1.0 - fx) + p11 * fx
    return top * (1.0 - fy) + bot * fy


def bilinear_gather_scalar(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W]; returns [...] interpolated scalar."""
    return bilinear_gather(img[..., None], u, v)[..., 0]
