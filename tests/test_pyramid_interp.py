import jax.numpy as jnp
import numpy as np
import pytest

from direct_stereo_slam_tpu.ops.pyramid import build_pyramid
from direct_stereo_slam_tpu.ops.interp import bilinear_gather, bilinear_gather_scalar

pytestmark = pytest.mark.smoke


def test_pyramid_shapes():
    img = jnp.zeros((64, 96), dtype=jnp.float32)
    pyr = build_pyramid(img, 4)
    assert pyr.levels == 4
    assert pyr.data[0].shape == (64, 96, 3)
    assert pyr.data[1].shape == (32, 48, 3)
    assert pyr.data[3].shape == (8, 12, 3)


def test_pyramid_downsample_is_mean():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16).astype(np.float32) * 255
    pyr = build_pyramid(jnp.asarray(img), 2)
    lvl1 = np.asarray(pyr.data[1][..., 0])
    manual = img.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(lvl1, manual, atol=1e-4)


def test_pyramid_gradients_linear_ramp():
    # I(x, y) = 3x + 2y -> dx = 3, dy = 2 away from borders
    ys, xs = np.mgrid[0:32, 0:32]
    img = (3.0 * xs + 2.0 * ys).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(img), 1)
    dx = np.asarray(pyr.data[0][..., 1])
    dy = np.asarray(pyr.data[0][..., 2])
    np.testing.assert_allclose(dx[5:-5, 5:-5], 3.0, atol=1e-4)
    np.testing.assert_allclose(dy[5:-5, 5:-5], 2.0, atol=1e-4)


def test_bilinear_matches_manual():
    rng = np.random.RandomState(1)
    img = rng.rand(16, 16, 3).astype(np.float32)
    u, v = 4.3, 7.6
    out = np.asarray(bilinear_gather(jnp.asarray(img), jnp.float32(u), jnp.float32(v)))
    ix, iy = int(u), int(v)
    fx, fy = u - ix, v - iy
    manual = (
        img[iy, ix] * (1 - fx) * (1 - fy)
        + img[iy, ix + 1] * fx * (1 - fy)
        + img[iy + 1, ix] * (1 - fx) * fy
        + img[iy + 1, ix + 1] * fx * fy
    )
    np.testing.assert_allclose(out, manual, rtol=1e-5)


def test_bilinear_batched():
    rng = np.random.RandomState(2)
    img = rng.rand(8, 8).astype(np.float32)
    us = jnp.array([1.5, 2.25, 3.0])
    vs = jnp.array([2.5, 0.75, 4.0])
    out = bilinear_gather_scalar(jnp.asarray(img), us, vs)
    assert out.shape == (3,)
    np.testing.assert_allclose(float(out[2]), img[4, 3], atol=1e-6)


def test_bilinear_planes_matches_channel_last():
    from direct_stereo_slam_tpu.ops.interp import bilinear_gather_planes

    rng = np.random.RandomState(3)
    img = rng.rand(24, 40, 3).astype(np.float32)
    us = jnp.asarray(rng.uniform(1, 38, 500), jnp.float32)
    vs = jnp.asarray(rng.uniform(1, 22, 500), jnp.float32)
    a = bilinear_gather(jnp.asarray(img), us, vs)
    b = bilinear_gather_planes(jnp.asarray(np.moveaxis(img, -1, 0)), us, vs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_take_forms_bitwise_match_gather():
    """bilinear_take_plane/channels/frames are lowering-level rewrites of
    bilinear_gather (rank-1 operand + [M, 128]-tiled indices); the f32
    arithmetic is identical term-for-term, so outputs must be BITWISE equal
    — including at clamped out-of-bounds coordinates and odd (non-128-
    multiple) index counts."""
    from direct_stereo_slam_tpu.ops.interp import (
        bilinear_take_channels, bilinear_take_frames, bilinear_take_plane)

    rng = np.random.RandomState(4)
    imgs = rng.rand(3, 24, 40, 3).astype(np.float32)
    n = 777  # deliberately not a multiple of 128 (pad lanes exercised)
    us = rng.uniform(-5, 45, n).astype(np.float32)   # includes OOB (clamped)
    vs = rng.uniform(-5, 29, n).astype(np.float32)
    uj, vj = jnp.asarray(us), jnp.asarray(vs)

    ref = np.asarray(bilinear_gather(jnp.asarray(imgs[1]), uj, vj))

    tp = np.asarray(bilinear_take_plane(jnp.asarray(imgs[1, ..., 0]), uj, vj))
    np.testing.assert_array_equal(tp, ref[..., 0])

    tc = bilinear_take_channels(jnp.asarray(imgs[1]), uj, vj)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(tc[c]), ref[..., c])

    fidx = jnp.asarray(rng.randint(0, 3, n), jnp.int32)
    tf = bilinear_take_frames(jnp.asarray(imgs), fidx, uj, vj)
    for c in range(3):
        per_frame = np.stack(
            [np.asarray(bilinear_gather(jnp.asarray(im), uj, vj))[..., c]
             for im in imgs])
        expect = per_frame[np.asarray(fidx), np.arange(n)]
        np.testing.assert_array_equal(np.asarray(tf[c]), expect)


def test_take_plane_multidim_and_scalar_shapes():
    from direct_stereo_slam_tpu.ops.interp import bilinear_take_plane

    rng = np.random.RandomState(5)
    img = rng.rand(16, 16).astype(np.float32)
    u = jnp.asarray(rng.uniform(0, 15, (4, 5, 6)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 15, (4, 5, 6)), jnp.float32)
    out = bilinear_take_plane(jnp.asarray(img), u, v)
    assert out.shape == (4, 5, 6)
    ref = bilinear_gather(jnp.asarray(img)[..., None], u, v)[..., 0]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # 0-d coords
    s = bilinear_take_plane(jnp.asarray(img), jnp.float32(3.25), jnp.float32(7.5))
    assert s.shape == ()
    np.testing.assert_allclose(
        float(s),
        float(bilinear_gather(jnp.asarray(img)[..., None],
                              jnp.float32(3.25), jnp.float32(7.5))[0]))
