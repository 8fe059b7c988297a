"""Approximate-time stereo sync (io.sync) — the bag-replay ingestion
model of the reference (main.cpp:320-345, message_filters::ApproximateTime
with queue size 10)."""

import numpy as np
import pytest

from direct_stereo_slam_tpu.io.sync import ApproximateTimeSync, replay

pytestmark = pytest.mark.smoke


def _pairs(stream0, stream1, slop, **kw):
    return list(replay([stream0, stream1], slop, **kw))


def test_perfectly_synced():
    t = [0.0, 0.1, 0.2, 0.3]
    out = _pairs([(x, f"a{i}") for i, x in enumerate(t)],
                 [(x, f"b{i}") for i, x in enumerate(t)], slop=0.01)
    assert [(a, b) for _, a, _, b in out] == \
        [("a0", "b0"), ("a1", "b1"), ("a2", "b2"), ("a3", "b3")]


def test_constant_offset_within_slop():
    # right camera triggers 4 ms late — classic unsynced stereo rig
    t0 = [i * 0.1 for i in range(5)]
    t1 = [x + 0.004 for x in t0]
    out = _pairs(list(zip(t0, range(5))), list(zip(t1, range(5))), slop=0.01)
    assert [(a, b) for _, a, _, b in out] == [(i, i) for i in range(5)]


def test_rate_mismatch_drops_extras():
    # left at 20 Hz, right at 10 Hz: every other left frame has no partner
    t0 = [i * 0.05 for i in range(10)]
    t1 = [i * 0.10 for i in range(5)]
    out = _pairs(list(zip(t0, range(10))), list(zip(t1, range(5))),
                 slop=0.01)
    assert [(a, b) for _, a, _, b in out] == [(2 * i, i) for i in range(5)]


def test_gap_drops_unmatched():
    # right stream misses frame 2 entirely
    t0 = [0.0, 0.1, 0.2, 0.3]
    t1 = [0.0, 0.1, 0.3]
    out = _pairs(list(zip(t0, "ABCD")), list(zip(t1, "abd")), slop=0.02)
    assert [(a, b) for _, a, _, b in out] == \
        [("A", "a"), ("B", "b"), ("D", "d")]


def test_out_of_slop_never_pairs():
    out = _pairs([(0.0, "A")], [(1.0, "b")], slop=0.1)
    assert out == []


def test_prefers_closer_lookahead():
    # b=1.00 should pair with a=1.001, not the earlier a=0.95
    out = _pairs([(0.95, "A0"), (1.001, "A1")], [(1.00, "b")], slop=0.1)
    assert [(a, b) for _, a, _, b in out] == [("A1", "b")]


def test_exact_tie_keeps_head():
    # lookahead that only TIES the current gap must not displace the head:
    # a=0.95 and a=1.05 are equidistant from b=1.00 — the earlier head wins
    # (strict `<` in _drain's lookahead; deliberate deterministic tie rule)
    out = _pairs([(0.95, "A0"), (1.05, "A1")], [(1.00, "b")], slop=0.1)
    assert [(a, b) for _, a, _, b in out] == [("A0", "b")]


def test_equal_timestamp_heads_pair_immediately():
    # ta == tb with a same-stamp lookahead on each side: the heads pair
    # (gap 0 can never be beaten), lookaheads pair next — nothing dropped
    out = _pairs([(1.0, "A0"), (2.0, "A1")], [(1.0, "b0"), (2.0, "b1")],
                 slop=0.5)
    assert [(a, b) for _, a, _, b in out] == [("A0", "b0"), ("A1", "b1")]


def test_queue_bound_and_dropped_counter():
    sync = ApproximateTimeSync(slop=0.001, queue_size=3)
    for i in range(10):
        assert sync.push(0, i * 0.1, i) == []
    # queue bounded at 3: seven frames already discarded
    assert sync.dropped == 7
    out = sync.push(1, 0.9, "b")
    assert [(a, b) for _, a, _, b in out] == [(9, "b")]


def test_monotonicity_enforced():
    sync = ApproximateTimeSync(slop=0.1)
    sync.push(0, 1.0, "x")
    with pytest.raises(ValueError):
        sync.push(0, 0.5, "y")


def test_unsynced_dataset(tmp_path):
    from direct_stereo_slam_tpu.io.dataset import UnsyncedStereoDataset

    d0 = tmp_path / "cam0"
    d1 = tmp_path / "cam1"
    d0.mkdir(); d1.mkdir()
    rng = np.random.RandomState(0)

    def write_pgm(path, seed):
        img = rng.randint(0, 255, (8, 12), dtype=np.uint8)
        with open(path, "wb") as f:
            f.write(b"P5\n12 8\n255\n" + img.tobytes())

    # left: 5 frames at 10 Hz; right: misses frame 2, stamps +3 ms
    for i in range(5):
        write_pgm(d0 / f"{i:03d}.pgm", i)
    for i in [0, 1, 3, 4]:
        write_pgm(d1 / f"{i:03d}.pgm", 100 + i)
    (tmp_path / "t0.txt").write_text(
        "\n".join(str(i * 0.1) for i in range(5)))
    (tmp_path / "t1.txt").write_text(
        "\n".join(str(i * 0.1 + 0.003) for i in [0, 1, 3, 4]))

    ds = UnsyncedStereoDataset(str(d0), str(d1), str(tmp_path / "t0.txt"),
                               str(tmp_path / "t1.txt"), slop=0.01)
    assert len(ds) == 4
    assert ds.dropped == 1
    f = ds.frame(0)
    assert f["img0"].shape == (8, 12)
    assert f["timestamp"] == 0.0
    # the paired left frames are 0,1,3,4 (frame 2 dropped)
    stamps = [ds.pairs[i][0] for i in range(4)]
    assert np.allclose(stamps, [0.0, 0.1, 0.3, 0.4])
