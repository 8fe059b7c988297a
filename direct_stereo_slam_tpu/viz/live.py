"""Live visualization: a self-refreshing HTML viewer.

TPU-native stand-in for the reference's Pangolin GUI
(pangolin_viewer/PangolinLoopViewer.{h,cpp}: three panes — trajectory +
cloud, KF depth image, lidar scan — plus loop-aware cloud re-posing via
``modifyKeyframePoseByKFID`` and green/red current-vs-matched scan display
via ``refreshLidarData``). A GL window cannot exist on a headless TPU pod;
instead the viewer rewrites ONE self-contained ``live.html`` (inline JSON
+ canvas JS, <meta refresh>) at a bounded rate. Open it in any browser
(file:// or through ``python -m http.server``) and watch the run: the
trajectory grows, the rolling cloud follows, loop closures visibly re-pose
past keyframes (poses are stored per-KF and points in camera frame, so a
pose-graph update moves the whole history, exactly like the reference's
``modifyKeyframePoseByKFID``), and the latest matched scan pair renders
green/red.

Per-KF state is bounded (MAX_KFS / PTS_PER_KF) so the file stays ~1 MB on
multi-thousand-frame runs."""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Dict, Optional

import numpy as np

MAX_KFS = 400          # newest keyframes kept in the view
PTS_PER_KF = 120       # cloud points kept per keyframe (camera frame)
SCAN_PTS = 600         # points per displayed scan
MIN_REFRESH_S = 0.5    # file rewrite rate bound


class LiveViewer:
    """Thread-safe accumulator + HTML writer. All hooks are cheap and
    non-blocking except the rate-limited file rewrite."""

    def __init__(self, path: str, title: str = "direct_stereo_slam_tpu"):
        self.path = path
        self.title = title
        self._lock = threading.Lock()
        self._kf_pose: Dict[int, np.ndarray] = {}     # kf_id -> T_wc [4,4]
        self._kf_pts: Dict[int, np.ndarray] = {}      # kf_id -> [K,3] cam
        self._cam_trail = []                          # per-frame positions
        self._scan_cur = np.zeros((0, 3))
        self._scan_matched = np.zeros((0, 3))
        self._loops = []                              # (id_a, id_b)
        self._n_loops_direct = 0
        self._n_loops_icp = 0
        self._last_write = 0.0
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)

    # ---- hooks (reference Output3DWrapper surface) -----------------------

    def publish_cam_pose(self, T_wc: np.ndarray):
        with self._lock:
            self._cam_trail.append(
                np.asarray(T_wc, np.float32)[:3, 3].copy())
        self._maybe_write()

    def publish_keyframe(self, kf_id: int, T_wc: np.ndarray,
                         pts_cam: Optional[np.ndarray] = None):
        """KeyFrameDisplay::setFromKF: store pose + a subsampled camera-
        frame cloud (final/marginalized publish, PangolinLoopViewer
        consumes final-only, cpp:151-175)."""
        with self._lock:
            self._kf_pose[int(kf_id)] = np.asarray(T_wc, np.float32).copy()
            if pts_cam is not None and len(pts_cam):
                p = np.asarray(pts_cam, np.float32)
                if len(p) > PTS_PER_KF:
                    p = p[:: max(1, len(p) // PTS_PER_KF)][:PTS_PER_KF]
                self._kf_pts[int(kf_id)] = p
            while len(self._kf_pose) > MAX_KFS:
                oldest = min(self._kf_pose)
                self._kf_pose.pop(oldest, None)
                self._kf_pts.pop(oldest, None)
        self._maybe_write()

    def modify_keyframe_poses(self, poses: Dict[int, np.ndarray],
                              loop_pair=None, n_direct=0, n_icp=0):
        """modifyKeyframePoseByKFID (cpp:177-182): the pose-graph result
        re-poses every stored keyframe cloud."""
        with self._lock:
            for kf_id, T in poses.items():
                if int(kf_id) in self._kf_pose:
                    self._kf_pose[int(kf_id)] = np.asarray(T, np.float32)
            if loop_pair is not None:
                self._loops.append((int(loop_pair[0]), int(loop_pair[1])))
            self._n_loops_direct = n_direct
            self._n_loops_icp = n_icp
        self._maybe_write(force=True)

    def refresh_lidar_data(self, scan_cur: np.ndarray,
                           scan_matched: Optional[np.ndarray] = None):
        """refreshLidarData (cpp:184-205): green current / red matched."""
        def sub(p):
            p = np.asarray(p, np.float32)
            if len(p) > SCAN_PTS:
                p = p[:: max(1, len(p) // SCAN_PTS)][:SCAN_PTS]
            return p
        with self._lock:
            self._scan_cur = sub(scan_cur)
            self._scan_matched = (sub(scan_matched)
                                  if scan_matched is not None
                                  else np.zeros((0, 3)))
        self._maybe_write()

    # ---- rendering -------------------------------------------------------

    def _maybe_write(self, force: bool = False):
        now = time.monotonic()
        if not force and now - self._last_write < MIN_REFRESH_S:
            return
        self._last_write = now
        try:
            self.write()
        except Exception:
            pass   # viewing must never take down the pipeline

    def _state_json(self) -> str:
        with self._lock:
            r2 = lambda a: np.round(np.asarray(a, np.float64), 2).tolist()
            cloud = []
            kfs = []
            for kf_id, T in self._kf_pose.items():
                kfs.append([int(kf_id)] + r2(T[:3, 3]))
                pts = self._kf_pts.get(kf_id)
                if pts is not None and len(pts):
                    world = pts @ T[:3, :3].T + T[:3, 3]
                    cloud.append(r2(world))
            state = {
                "title": self.title,
                "time": time.strftime("%H:%M:%S"),
                "trail": r2(np.asarray(self._cam_trail[-4000:])
                            if self._cam_trail else np.zeros((0, 3))),
                "kfs": kfs,
                "cloud": [p for seg in cloud for p in seg],
                "scan_cur": r2(self._scan_cur),
                "scan_matched": r2(self._scan_matched),
                "loops": self._loops[-200:],
                "n_direct": self._n_loops_direct,
                "n_icp": self._n_loops_icp,
            }
        return json.dumps(state, separators=(",", ":"))

    def write(self):
        html = _HTML_TEMPLATE.replace("__STATE__", self._state_json())
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write(html)
        os.replace(tmp, self.path)


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8">
<meta http-equiv="refresh" content="1">
<title>dsslam live</title>
<style>
 body{background:#14141e;color:#cfcfe0;font:13px monospace;margin:12px}
 canvas{background:#0b0b12;border:1px solid #333;margin-right:10px}
 .row{display:flex} .pane{margin-right:14px}
 h3{margin:4px 0;color:#8fb3ff;font-size:13px}
</style></head><body>
<div id="hdr"></div>
<div class="row">
 <div class="pane"><h3>trajectory + cloud (top-down x/z)</h3>
   <canvas id="map" width="640" height="540"></canvas></div>
 <div class="pane"><h3>current scan (green) vs matched (red)</h3>
   <canvas id="scan" width="420" height="540"></canvas></div>
</div>
<script>
const S = __STATE__;
document.getElementById('hdr').textContent =
  S.title + '  |  ' + S.time + '  |  frames: ' + S.trail.length +
  '  kfs: ' + S.kfs.length + '  loops: ' + S.n_direct + ' direct + ' +
  S.n_icp + ' icp';
function fit(pts){
  if(!pts.length) return [0,0,1];
  let xs=pts.map(p=>p[0]), zs=pts.map(p=>p[2]);
  let x0=Math.min(...xs), x1=Math.max(...xs);
  let z0=Math.min(...zs), z1=Math.max(...zs);
  let cx=(x0+x1)/2, cz=(z0+z1)/2;
  let s=Math.max(x1-x0, z1-z0, 1e-3);
  return [cx, cz, s*1.15];
}
function draw(id, layers){
  const c=document.getElementById(id), g=c.getContext('2d');
  g.clearRect(0,0,c.width,c.height);
  let all=[].concat(...layers.map(l=>l.pts));
  const [cx,cz,s]=fit(all);
  const px=p=>[(p[0]-cx)/s*c.width + c.width/2,
               (p[2]-cz)/s*c.height*(-1) + c.height/2];
  for(const l of layers){
    g.fillStyle=l.color; g.strokeStyle=l.color;
    if(l.line && l.pts.length>1){
      g.beginPath();
      let [x,y]=px(l.pts[0]); g.moveTo(x,y);
      for(const p of l.pts.slice(1)){const [a,b]=px(p); g.lineTo(a,b);}
      g.stroke();
    } else {
      for(const p of l.pts){const [x,y]=px(p);
        g.fillRect(x-l.r, y-l.r, 2*l.r, 2*l.r);}
    }
  }
}
draw('map', [
  {pts:S.cloud, color:'#5f6f95', r:1},
  {pts:S.trail, color:'#ffd454', line:true},
  {pts:S.kfs.map(k=>[k[1],k[2],k[3]]), color:'#ff6464', r:2},
]);
draw('scan', [
  {pts:S.scan_matched, color:'#e05050', r:1.5},
  {pts:S.scan_cur, color:'#50d070', r:1.5},
]);
</script></body></html>
"""
