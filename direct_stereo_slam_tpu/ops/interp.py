"""Bilinear interpolation of (I, dx, dy) planes — the inner-loop gather.

Equivalent of DSO ``getInterpolatedElement33/31`` (reference call sites:
TrackerAndScaler.cpp:790, 1106; PoseEstimator.cpp:237; LoopHandler.cpp:177).

TPU notes: implemented as four XLA gathers over a flattened image with
precomputed linear indices; out-of-bounds lanes are clamped and must be
masked by the caller (the kernels all carry an explicit validity mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# TPU gathers have two regimes (measured on v5e): few indices -> cost is
# per-gather-op latency, so 4 rows-of-C gathers win; many indices -> cost is
# per-index, and gathers of scalar rows are ~7x cheaper than rows-of-C
# (0.025 ms vs 0.168 ms at 262k indices). The scalar-row form needs
# planes-first [C, H, W] STORAGE: transposing [H, W, 3] on the fly is worse
# than either (TPU minor-dim-3 transposes are extremely slow). Callers with
# large index sets keep their images planes-first and use
# bilinear_gather_planes; everyone else uses bilinear_gather.


def bilinear_gather(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C] (channel-last); u, v: [...] pixel coords -> [..., C].

    Matches the reference's convention: sample at (u, v) interpolates the
    four pixels (ix, iy), (ix+1, iy), (ix, iy+1), (ix+1, iy+1) with
    fractional weights. Coordinates are clamped; callers mask invalid lanes.
    """
    H, W, C = img.shape
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    base = iy * W + ix
    fx = (u - ix)[..., None]
    fy = (v - iy)[..., None]
    flat = img.reshape(H * W, C)
    p00 = flat[base]
    p10 = flat[base + 1]
    p01 = flat[base + W]
    p11 = flat[base + W + 1]
    top = p00 * (1.0 - fx) + p10 * fx
    bot = p01 * (1.0 - fx) + p11 * fx
    return top * (1.0 - fy) + bot * fy


def bilinear_gather_planes(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img: [C, H, W] (planes-first, contiguous); -> [..., C].

    Scalar-row gathers over channel-concatenated planes — the fast form for
    large index sets (BA linearization, epipolar traces, activation)."""
    C, H, W = img.shape
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    base = iy * W + ix
    fx = u - ix
    fy = v - iy
    flat = img.reshape(C * H * W)
    coff = (jnp.arange(C, dtype=jnp.int32) * (H * W)).reshape(
        (C,) + (1,) * base.ndim)
    idx = base[None, ...] + coff
    p00 = flat[idx]
    p10 = flat[idx + 1]
    p01 = flat[idx + W]
    p11 = flat[idx + W + 1]
    top = p00 + fx[None, ...] * (p10 - p00)
    bot = p01 + fx[None, ...] * (p11 - p01)
    return jnp.moveaxis(top + fy[None, ...] * (bot - top), 0, -1)


def bilinear_gather_scalar(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W]; returns [...] interpolated scalar."""
    return bilinear_gather(img[..., None], u, v)[..., 0]
