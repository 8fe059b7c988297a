"""SLAM node driver: the reference's ``SLAMNode`` (main.cpp:44-265).

Owns undistorters, the front end and the loop handler; feeds synced stereo
pairs; detects new sequences by timestamp gap (>10 s -> lost,
main.cpp:222-227); reinitializes the front end on loss/init-failure while
preserving the current pose, the keyframe-count offset and the loop
handler (main.cpp:229-245); prints the per-stage timing table at shutdown
(main.cpp:178-210).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SLAMConfig
from ..geometry.camera import PyramidIntrinsics, make_pyramid_intrinsics
from ..models.frontend import FrontEnd
from ..utils.timing import StageTimers


class SLAMNode:
    def __init__(
        self,
        cfg: SLAMConfig,
        intr0: PyramidIntrinsics,
        intr1: PyramidIntrinsics,
        t_cam1_cam0: np.ndarray,
        loop_handler=None,
        undistorter0=None,
        undistorter1=None,
    ):
        self.cfg = cfg
        self.intr0 = intr0
        self.intr1 = intr1
        self.t_cam1_cam0 = np.asarray(t_cam1_cam0, np.float32)
        self.undistorter0 = undistorter0
        self.undistorter1 = undistorter1
        self.loop_handler = loop_handler
        self.timers = StageTimers()

        self.frontend = FrontEnd(cfg, intr0, intr1, self.t_cam1_cam0,
                                 timers=self.timers)
        self.incoming_id = 0
        self.current_timestamp = -1.0
        self._last_published_shell = None

        # live viewer + debug observability (PangolinLoopViewer /
        # goStepByStep / idepth-jet equivalents; cfg.runtime flags)
        self.viewer = None
        if cfg.runtime.live_view_path:
            from ..viz.live import LiveViewer
            self.viewer = LiveViewer(cfg.runtime.live_view_path)
            if self.loop_handler is not None:
                self.loop_handler.viewer = self.viewer

    def process(self, img0, img1, timestamp: float, exposure: float = 1.0):
        """One synced stereo pair (imageMessageCallback, main.cpp:212-265).
        ``exposure`` is the left frame's exposure time when the dataset
        provides one (ImageAndExposure; 1.0 otherwise)."""
        # new-sequence detection
        if (
            self.current_timestamp > 0
            and abs(timestamp - self.current_timestamp) > self.cfg.runtime.sequence_gap_seconds
        ):
            self.frontend.is_lost = True
        self.current_timestamp = timestamp

        # reinitialize preserving pose + KF offset (main.cpp:229-245)
        if self.frontend.init_failed or self.frontend.is_lost:
            # commit any deferred keyframe tail first: its marginalized-KF
            # exports must survive into the carried-over queue (any
            # pipelined in-flight frame is dropped — tracking was lost)
            self.frontend._pl_reset()
            self.frontend.flush_pending()
            last_pose = self.frontend.cur_pose
            prev_kf = self.frontend.num_kfs  # already global (offset baked in)
            queue = self.frontend.marginalized_queue
            self.frontend = FrontEnd(
                self.cfg, self.intr0, self.intr1, self.t_cam1_cam0,
                prev_kf_count=prev_kf, timers=self.timers,
            )
            self.frontend.cur_pose = last_pose
            self.frontend.marginalized_queue = queue
            # mark the sequence restart for the pose graph: the first
            # marginalized KF of the new sequence carries dso_error = NaN so
            # it gets no odometry constraint (FrontEndMarginalize.cpp:197-202)
            self.frontend.last_dso_error = float("nan")

        if self.undistorter0 is not None:
            img0 = self.undistorter0(img0)
        if self.undistorter1 is not None:
            img1 = self.undistorter1(img1)

        with self.timers.span("per_frame"):
            shell = self.frontend.add_stereo_frame(
                img0, img1, self.incoming_id, timestamp, exposure=exposure
            )
        self.incoming_id += 1

        # Viewer/debug read the newest FULLY-PROCESSED shell: in pipelined
        # mode the returned shell is in flight (placeholder pose, is_kf set
        # only at consume one frame later); last_completed_shell is the
        # frame whose pose/KF status are final (ADVICE r3)
        done = self.frontend.last_completed_shell
        fresh = done is not None and done is not self._last_published_shell
        if fresh:
            self._last_published_shell = done
        rt = self.cfg.runtime
        if self.viewer is not None and fresh:
            self.viewer.publish_cam_pose(done.T_wc)
            if done.is_kf and self.frontend.template is not None:
                # live KF depth pane (the reference viewer's pushDepthImage
                # path); costs one bundled template pull per KF, viewer
                # opt-in only
                from ..viz.debug import render_template_idepth
                fe = self.frontend
                self.viewer.publish_depth_image(render_template_idepth(
                    fe.template, fe.pyramids.get(fe.template_kf_slot)))
        if rt.debug_dump_dir and fresh and self.frontend.template is not None:
            from ..viz.debug import (
                dump_template_idepth, dump_tracking_residual,
                dump_window_stitch)
            import math as _math
            fe = self.frontend
            if done.is_kf:
                kf_id = fe.num_kfs - 1
                slot = fe.template_kf_slot
                dump_template_idepth(
                    rt.debug_dump_dir, kf_id, fe.template,
                    fe.pyramids.get(slot))
                # window stitch (FrontEndDebugStuff.cpp:34-310)
                dump_window_stitch(rt.debug_dump_dir, kf_id, fe)
            elif (done is shell
                  and getattr(done, "_T_ref_new", None) is not None):
                # residual image of the accepted tracking pose against the
                # (unchanged) template (TrackerAndScaler.cpp:730-734);
                # skipped on KF frames, whose template was just rebuilt.
                # Needs the frame's own image, so it only runs when the
                # completed shell IS this call's frame (synchronous mode);
                # pipelined mode skips it (the completed frame's raw image
                # is no longer held)
                ra = fe.template_ref_aff_np
                a_rel = _math.exp(done.aff[0] - ra[0]) * (
                    done.exposure / max(fe.template_ref_exposure_np, 1e-9))
                b_rel = done.aff[1] - a_rel * ra[1]
                dump_tracking_residual(
                    rt.debug_dump_dir, self.incoming_id - 1,
                    np.asarray(img0), fe.template, self.intr0,
                    np.asarray(done._T_ref_new), a_rel, b_rel)
        if rt.step_by_step:
            # goStepByStep (FrontEnd.cpp:689-700): block until Enter
            input(f"[step] frame {self.incoming_id - 1} "
                  f"kf={shell.is_kf} — Enter to continue ")

        # hand marginalized KFs to the loop handler; without one, still
        # drain (each record pins its KF's full pyramid — an unbounded
        # queue would leak a window's worth of images per marginalization)
        while self.frontend.marginalized_queue:
            mkf = self.frontend.marginalized_queue.pop(0)
            if self.loop_handler is not None:
                self.loop_handler.publish_keyframe(mkf)
        return shell

    def finish(self):
        """Flush remaining window KFs as trajectory records and return the
        odometry trajectory rows (incoming_id x y z), the reference's
        sodso.txt content (LoopHandler.cpp:60-80)."""
        self.frontend.flush_pipeline()
        self.frontend.flush_pending()
        while self.frontend.marginalized_queue:
            mkf = self.frontend.marginalized_queue.pop(0)
            if self.loop_handler is not None:
                self.loop_handler.publish_keyframe(mkf)
        rows = []
        if self.loop_handler is not None:
            self.loop_handler.join()     # drain the async queue (threaded)
            rows = self.loop_handler.odometry_rows()
        return rows

    def timing_report(self) -> str:
        names = [
            "feature_detect", "scale_opt", "dso_opt", "track", "trace",
            "activate", "template", "point_marg", "frame_marg",
            "pts_generation", "sc_generation", "search_ringkey", "search_sc",
            "direct_est", "icp", "pose_graph_opt", "per_frame",
        ]
        rep = self.timers.report(
            [n for n in names if n in self.timers.times])
        acc = getattr(self.frontend, "_trace_overflow_acc", None)
        if acc is not None:
            # lanes the trace-search budget deferred to a later frame
            # (cfg.trace.search_budget); nonzero = the cap actually bound
            rep += f"\ntrace_overflow {int(acc)}"
        return rep


def write_trajectory(path: str, rows):
    """Write `incoming_id x y z` rows (sodso.txt/dslam.txt format)."""
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r[0]} {r[1]:.6f} {r[2]:.6f} {r[3]:.6f}\n")
