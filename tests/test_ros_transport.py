"""Live ROS1 transport loopback: MiniMaster + TCPROS pub/sub + the
ApproximateTime stereo source (reference main.cpp:347-362)."""

import threading
import time

import numpy as np
import pytest

from direct_stereo_slam_tpu.io.ros_transport import (
    ImagePublisher, ImageSubscriber, MiniMaster, StereoTopicSource)

pytestmark = pytest.mark.smoke


def _wait_for(pred, timeout=10.0, step=0.02):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(step)
    return False


def test_pubsub_single_topic():
    master = MiniMaster()
    got = []
    sub = ImageSubscriber("/cam/image_raw", master.uri, got.append)
    pub = ImagePublisher("/cam/image_raw", master.uri)
    try:
        assert _wait_for(lambda: pub._subs), "subscriber never connected"
        rng = np.random.RandomState(0)
        imgs = [rng.randint(0, 255, (8, 10), np.uint8) for _ in range(4)]
        for i, im in enumerate(imgs):
            pub.publish(im, 5.0 + 0.1 * i)
        assert _wait_for(lambda: len(got) == 4), f"got {len(got)}/4"
        for i, msg in enumerate(got):
            assert msg.stamp == pytest.approx(5.0 + 0.1 * i, abs=1e-6)
            np.testing.assert_array_equal(
                msg.data, imgs[i].astype(np.float32))
    finally:
        sub.close(); pub.close(); master.close()


def test_subscriber_before_and_after_publisher():
    """publisherUpdate path: a subscriber registered BEFORE the publisher
    exists must connect when the master pushes the update."""
    master = MiniMaster()
    got = []
    sub = ImageSubscriber("/late/image", master.uri, got.append)
    time.sleep(0.05)
    pub = ImagePublisher("/late/image", master.uri)
    try:
        assert _wait_for(lambda: pub._subs), "no connection after update"
        pub.publish(np.zeros((4, 4), np.uint8), 1.0)
        assert _wait_for(lambda: len(got) == 1)
    finally:
        sub.close(); pub.close(); master.close()


def test_stereo_source_pairs_and_drives_sync():
    """Two live topics with offset stamps -> ApproximateTime pairs in
    order, mirroring the reference's message_filters configuration."""
    master = MiniMaster()
    pairs = []
    src = StereoTopicSource(master.uri, "/cam0/image_raw",
                            "/cam1/image_raw",
                            lambda a, b: pairs.append((a.stamp, b.stamp)))
    pub0 = ImagePublisher("/cam0/image_raw", master.uri, "/p0")
    pub1 = ImagePublisher("/cam1/image_raw", master.uri, "/p1")
    try:
        assert _wait_for(lambda: pub0._subs and pub1._subs)
        im = np.zeros((6, 6), np.uint8)
        for i in range(5):
            pub0.publish(im, 10.0 + 0.1 * i)
            pub1.publish(im, 10.0 + 0.1 * i + 0.01)   # 10 ms offset
        assert _wait_for(lambda: len(pairs) >= 4), f"paired {len(pairs)}"
        for t0, t1 in pairs:
            assert abs(t0 - t1) < 0.05
        stamps0 = [p[0] for p in pairs]
        assert stamps0 == sorted(stamps0)
    finally:
        src.close(); pub0.close(); pub1.close(); master.close()


def test_live_cli_end_to_end(tmp_path):
    """run_slam.py --ros-master: a live TCPROS session drives the full
    SLAM pipeline and writes trajectories (reference main.cpp:347-362)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset

    W, H = 96, 48
    ds = SyntheticStereoDataset(n_frames=6, width=W, height=H, speed=0.2)
    K = ds.K
    calib = tmp_path / "cam.txt"
    calib.write_text(
        f"Pinhole {K[0,0]} {K[1,1]} {K[0,2]} {K[1,2]} 0\n"
        f"{W} {H}\nfull\n{W} {H}\n")

    master = MiniMaster()
    pub0 = ImagePublisher("/cam0/image_raw", master.uri, "/p0")
    pub1 = ImagePublisher("/cam1/image_raw", master.uri, "/p1")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts", "run_slam.py"),
         "--ros-master", master.uri, "--calib0", str(calib),
         "--cpu", "--levels", "3", "--lidar-range", "-1",
         "--ros-idle", "20", "--out", str(tmp_path / "out")],
        env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        assert _wait_for(lambda: pub0._subs and pub1._subs, timeout=60), \
            "CLI never subscribed"
        for i in range(6):
            f = ds.frame(i)
            im0 = np.clip(np.asarray(f["img0"]), 0, 255).astype(np.uint8)
            im1 = np.clip(np.asarray(f["img1"]), 0, 255).astype(np.uint8)
            t = float(f["timestamp"])
            pub0.publish(im0, t)
            pub1.publish(im1, t)
            time.sleep(0.02)
        out = proc.communicate(timeout=480)[0]
        assert proc.returncode == 0, out[-3000:]
        # trajectory files exist (legitimately empty at 6 frames: no KF
        # marginalizes out of the window); the per-stage table proves all
        # 6 live pairs went through the full pipeline
        assert (tmp_path / "out" / "sodso.txt").exists()
        import re
        m = re.search(r"per_frame: [\d.]+ms x (\d+)", out)
        assert m, f"no per_frame stats; CLI output:\n{out[-3000:]}"
        assert int(m.group(1)) == 6, out[-1500:]
    finally:
        proc.kill()
        pub0.close(); pub1.close(); master.close()
