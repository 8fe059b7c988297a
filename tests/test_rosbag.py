"""rosbag v2.0 reader + stereo replay (reference main.cpp:320-345).

The writer half exists for these tests (and tooling): it produces a
structurally valid v2.0 bag (magic, padded bag-header record, connection
records, one none/bz2 chunk of message-data records) that the reader —
which scans chunks rather than trusting indexes, like rosbag::View does
on an unindexed bag — must round-trip exactly."""

import numpy as np
import pytest

from direct_stereo_slam_tpu.io.rosbag import (
    ImageMsg, RosbagReader, replay_stereo_bag, serialize_image,
    write_stereo_bag, _decode_image)

pytestmark = pytest.mark.smoke


def _imgs(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (12, 16), np.uint8) for _ in range(n)]


def test_roundtrip_both_compressions(tmp_path):
    left = _imgs(3, 0)
    right = _imgs(3, 1)
    msgs = []
    for i in range(3):
        msgs.append(("/cam0/image_raw", 10.0 + 0.1 * i, left[i]))
        msgs.append(("/cam1/image_raw", 10.0 + 0.1 * i + 0.004, right[i]))
    for comp in ("none", "bz2"):
        path = str(tmp_path / f"t_{comp}.bag")
        write_stereo_bag(path, msgs, compression=comp)
        r = RosbagReader(path)
        assert r.topics() == {"/cam0/image_raw": "sensor_msgs/Image",
                              "/cam1/image_raw": "sensor_msgs/Image"}
        out = list(r.images())
        assert len(out) == 6
        # chronological order preserved
        stamps = [m.stamp for _, m in out]
        assert stamps == sorted(stamps)
        for i in range(3):
            t0, m0 = out[2 * i]
            assert t0 == "/cam0/image_raw"
            np.testing.assert_array_equal(m0.data, left[i].astype(np.float32))
            assert m0.stamp == pytest.approx(10.0 + 0.1 * i, abs=1e-6)


def test_replay_pairing_and_tolerance(tmp_path):
    """Latest-from-each pairing with the reference's 0.1 s stamp check:
    a pair violating the tolerance is dropped, not fired."""
    im = _imgs(1)[0]
    msgs = [
        ("/cam0/image_raw", 1.00, im),
        ("/cam1/image_raw", 1.01, im),      # pair 1 (dt = 0.01)
        ("/cam0/image_raw", 2.00, im),      # unmatched left...
        ("/cam0/image_raw", 3.00, im),      # superseded by this one
        ("/cam1/image_raw", 3.02, im),      # pair 2 (dt = 0.02)
        ("/cam0/image_raw", 4.00, im),
        ("/cam1/image_raw", 4.50, im),      # dt = 0.5 -> dropped
        ("/cam0/image_raw", 5.00, im),
        ("/cam1/image_raw", 5.05, im),      # pair 3
    ]
    path = str(tmp_path / "p.bag")
    write_stereo_bag(path, msgs)
    got = []
    n = replay_stereo_bag(path, "/cam0/image_raw", "/cam1/image_raw",
                          lambda a, b: got.append((a.stamp, b.stamp)))
    assert n == 3
    assert got == [(pytest.approx(1.0), pytest.approx(1.01)),
                   (pytest.approx(3.0), pytest.approx(3.02)),
                   (pytest.approx(5.0), pytest.approx(5.05))]


def test_color_and_16bit_decoding():
    """cv_bridge toCvShare(msg, 'mono8') conversions: rgb8/bgr8 luma,
    mono16 scaled by 1/256."""
    import struct

    def wire(h, w, encoding, payload):
        fid = b"cam"
        step = {"rgb8": w * 3, "bgr8": w * 3, "mono16": w * 2}[encoding]
        return (struct.pack("<III", 0, 7, 500000000)
                + struct.pack("<I", len(fid)) + fid
                + struct.pack("<II", h, w)
                + struct.pack("<I", len(encoding)) + encoding.encode()
                + b"\x00" + struct.pack("<I", step)
                + struct.pack("<I", len(payload)) + payload)

    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 100; rgb[..., 1] = 50; rgb[..., 2] = 200
    m = _decode_image(wire(2, 2, "rgb8", rgb.tobytes()))
    expect = 0.299 * 100 + 0.587 * 50 + 0.114 * 200
    np.testing.assert_allclose(m.data, expect, atol=1e-4)
    assert m.stamp == pytest.approx(7.5)

    m2 = _decode_image(wire(2, 2, "bgr8", rgb.tobytes()))
    expect2 = 0.299 * 200 + 0.587 * 50 + 0.114 * 100
    np.testing.assert_allclose(m2.data, expect2, atol=1e-4)

    u16 = np.full((2, 2), 512, "<u2")
    m3 = _decode_image(wire(2, 2, "mono16", u16.tobytes()))
    np.testing.assert_allclose(m3.data, 2.0)


def test_replay_drives_slam_node(tmp_path):
    """A bag written from the synthetic renderer drives SLAMNode through
    the replay loop — the reference's end-to-end bag path."""
    import jax

    from direct_stereo_slam_tpu.config import make_config
    from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
    from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
    from direct_stereo_slam_tpu.runtime.node import SLAMNode

    W, H = 96, 48
    ds = SyntheticStereoDataset(n_frames=6, width=W, height=H, speed=0.2)
    msgs = []
    for i in range(len(ds)):
        f = ds.frame(i)
        msgs.append(("/cam0/image_raw", float(f["timestamp"]),
                     np.clip(np.asarray(f["img0"]), 0, 255).astype(np.uint8)))
        msgs.append(("/cam1/image_raw", float(f["timestamp"]),
                     np.clip(np.asarray(f["img1"]), 0, 255).astype(np.uint8)))
    path = str(tmp_path / "drive.bag")
    write_stereo_bag(path, msgs, compression="bz2")

    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=3,
                                      max_iterations=(10, 20, 20)),
        ba=cfg.ba.__class__(max_frames=4, min_frames=3,
                            max_points_per_frame=64,
                            max_immature_per_frame=128,
                            desired_point_density=150.0,
                            desired_immature_density=100.0))
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, 3)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0)
    n = replay_stereo_bag(
        path, "/cam0/image_raw", "/cam1/image_raw",
        lambda a, b: node.process(a.data, b.data, a.stamp))
    node.finish()
    assert n == 6
    assert node.frontend.initialized
    assert not node.frontend.is_lost
