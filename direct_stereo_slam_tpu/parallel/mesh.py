"""Multi-chip execution: data-parallel batch evaluation over sequences.

The reference is a single-process shared-memory system (SURVEY.md §2.3);
SLAM state is inherently sequential, so the TPU-native multi-chip story is
data parallelism over *sequences/configs* (BASELINE.json config 5: headless
batch eval over KITTI 00-10): each device runs an independent sequence's
per-frame step; within a device the point/candidate axes stay batched.

``batched_tracking_step`` is the fleet-style "training step": B sequences'
tracker templates + new frames -> tracked poses + stereo scale, jitted over
a ``Mesh('seq')`` with `shard_map` so each device owns B/n sequences and no
cross-device collectives sit on the per-frame critical path (an all-gather
of the tiny pose outputs rides ICI only at the epoch boundary).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SLAMConfig
from ..geometry.camera import PyramidIntrinsics
from ..models.depth_template import TrackerTemplate
from ..models.tracker import AffLight, track_candidate
from ..models.scale_opt import optimize_scale_single
from ..ops.pyramid import build_pyramid


class BatchedStepOut(NamedTuple):
    T: jnp.ndarray          # [B, 4, 4] tracked ref->new poses
    res: jnp.ndarray        # [B] finest-level residuals
    scale: jnp.ndarray      # [B] optimized stereo scale
    scale_err: jnp.ndarray  # [B]


def make_batched_step(intr: PyramidIntrinsics, cfg: SLAMConfig, levels: int):
    """Returns step(batch) -> BatchedStepOut for one frame of B sequences.

    batch: dict with img0 [B, H, W], img1 [B, H, W], template (TrackerTemplate
    with leading batch dim on every leaf), T_init [B, 4, 4]."""

    def one_sequence(img0, img1, template, T_init):
        pyr0 = build_pyramid(img0, levels)
        pyr1 = build_pyramid(img1, levels)
        # derive scalars from per-shard data: under shard_map's varying-axes
        # checking (jax>=0.8), replicated literals in while_loop carries
        # clash with shard-varying outputs
        z = img0[0, 0] * 0.0
        zero = AffLight(z, z)
        one = z + 1.0
        tr = track_candidate(
            tuple(pyr0.data), template, intr, cfg, T_init, zero, zero, one, one
        )
        t10 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(-0.54)
        so = optimize_scale_single(
            tuple(pyr1.data), template, intr, intr, t10, cfg, jnp.float32(1.0)
        )
        return BatchedStepOut(
            T=tr.T, res=tr.res_per_level[0], scale=so.scale, scale_err=so.error
        )

    def step(img0, img1, template, T_init):
        return jax.vmap(one_sequence, in_axes=(0, 0, 0, 0))(
            img0, img1, template, T_init
        )

    return step


def shard_batched_step(step_fn, mesh: Mesh):
    """Shard the batched step over the 'seq' mesh axis with shard_map: every
    leaf is partitioned on its leading (sequence) dimension."""
    spec = P("seq")

    def sharded(img0, img1, template, T_init):
        # NB: the new jax.shard_map (0.8+) alters weak-type promotion inside
        # the wrapped function, breaking while_loop carry typing in the
        # tracker; the experimental entry point behaves correctly.
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.experimental.shard_map import shard_map

        fn = shard_map(
            step_fn, mesh=mesh,
            in_specs=(spec, spec, jax.tree_util.tree_map(lambda _: spec, template),
                      spec),
            out_specs=BatchedStepOut(T=spec, res=spec, scale=spec, scale_err=spec),
            check_rep=False,   # literal scalars in LM carries are replicated
        )
        return fn(img0, img1, template, T_init)

    return jax.jit(sharded)


def shard_ba_optimize(cfg: SLAMConfig, mesh: Mesh, iterations: int = 2):
    """Shard windowed-BA optimization over the 'seq' mesh axis: a batch of
    B independent BA windows (BAState with a leading batch dim on every
    leaf) solves as vmap(ba.optimize) inside shard_map — each device owns
    B/n windows, no collectives on the solve path. This is the keyframe
    "training step" counterpart of the per-frame tracking step above."""
    from ..models import ba as ba_mod

    def step(states):
        def one(st):
            st2, rmse, ok = ba_mod.optimize(st, cfg, iterations)
            return st2, rmse, ok
        return jax.vmap(one)(states)

    spec = P("seq")

    def sharded(states):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.experimental.shard_map import shard_map
        in_spec = jax.tree_util.tree_map(lambda _: spec, states)
        fn = shard_map(
            step, mesh=mesh,
            in_specs=(in_spec,),
            out_specs=(in_spec, spec, spec),
            check_rep=False,
        )
        return fn(states)

    return jax.jit(sharded)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("seq",))
