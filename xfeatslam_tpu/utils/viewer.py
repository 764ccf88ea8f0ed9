"""Offline visualization: map / trajectory / frame renders to PNG.

Role of the reference's Pangolin viewer thread (/root/reference/src/
Viewer.cc, MapDrawer.cc: map points, keyframe frusta, covisibility graph;
FrameDrawer.cc: keypoints + state banner). Headless-first: renders are
written as images (matplotlib Agg), suitable for notebooks/CI; no GL
dependency."""

from __future__ import annotations

from typing import Optional

import numpy as np


def render_map(slam_map, path: str, trajectory=None, title: str = "map",
               max_points: int = 20000, center=None, half_width: float = 6.0,
               view: str = "both"):
    """Top-down (x-z) / side (x-y) map render: points, keyframe frusta,
    covisibility edges, optional frame trajectory.

    center: world point to center the axes on with ±half_width extents
    (the viewer's follow-camera mode); view: "both" | "top" | "side"
    (the top-view/camera-view menu toggle)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    alive = slam_map.points.alive[: slam_map.points.n]
    X = slam_map.points.pos[: slam_map.points.n][alive][:max_points]
    centers = {k: kf.center() for k, kf in slam_map.keyframes.items()}

    panels = [(0, 2, "x-z (top)"), (0, 1, "x-y (side)")]
    if view == "top":
        panels = panels[:1]
    elif view == "side":
        panels = panels[1:]
    fig, axes = plt.subplots(1, len(panels), figsize=(7 * len(panels), 7),
                             squeeze=False)
    for ax, (i, j, name) in zip(axes[0], panels):
        if len(X):
            ax.scatter(X[:, i], X[:, j], s=0.5, c="#888888", alpha=0.5,
                       label=f"{len(X)} points")
        # covisibility edges
        for k, edges in slam_map.covis.items():
            if k not in centers:
                continue
            for k2 in edges:
                if k2 in centers and k2 > k:
                    c1, c2 = centers[k], centers[k2]
                    ax.plot([c1[i], c2[i]], [c1[j], c2[j]], "-",
                            c="#88bb88", lw=0.5, alpha=0.6)
        if centers:
            C = np.stack(list(centers.values()))
            ax.plot(C[:, i], C[:, j], "s", c="#3366cc", ms=4,
                    label=f"{len(C)} keyframes")
        if trajectory is not None and len(trajectory):
            T = np.stack([(-R.T @ t) for (_ts, R, t, _s) in trajectory])
            ax.plot(T[:, i], T[:, j], "-", c="#cc3333", lw=1.0,
                    label="trajectory")
        ax.set_title(f"{title} — {name}")
        ax.set_aspect("equal")
        if center is not None:
            ax.set_xlim(center[i] - half_width, center[i] + half_width)
            ax.set_ylim(center[j] - half_width, center[j] + half_width)
        ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def render_frame(gray: np.ndarray, frame, path: str,
                 state_text: str = ""):
    """FrameDrawer role: image + keypoints (tracked in green, untracked in
    blue) + status banner."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 7.5))
    ax.imshow(gray, cmap="gray")
    v = frame.valid
    tracked = v & (frame.mp_ids >= 0) & frame.inlier
    free = v & ~tracked
    ax.plot(frame.kpts[free, 0], frame.kpts[free, 1], "o", ms=2,
            mfc="none", c="#4488ff", label=f"{int(free.sum())} detected")
    ax.plot(frame.kpts[tracked, 0], frame.kpts[tracked, 1], "o", ms=3,
            mfc="none", c="#33cc33", label=f"{int(tracked.sum())} tracked")
    banner = state_text or f"frame {frame.fid}"
    ax.set_title(banner)
    ax.legend(loc="lower right", fontsize=8)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


class LiveViewer:
    """'Live' viewer for a running session (role of the reference's Viewer
    thread + FrameDrawer/MapDrawer, /root/reference/src/Viewer.cc:25-255:
    a 30 fps Pangolin window over the current frame and map). Headless
    re-design: every `every`-th frame the current frame overlay and map
    view are rendered and atomically swapped into <out_dir>/live_frame.png
    and <out_dir>/live_map.png — a file watcher, notebook, or browser
    pointed at the files follows the session live. Rendered frames are
    kept (bounded) and assembled into an animated GIF on close().
    """

    def __init__(self, out_dir: str, every: int = 5, max_history: int = 120,
                 gif_scale: int = 2):
        import os

        self.out = out_dir
        self.every = max(1, int(every))
        self.max_history = max_history
        self.gif_scale = gif_scale
        self._n = 0
        self._hist = []
        os.makedirs(out_dir, exist_ok=True)

    def _swap_in(self, tmp: str, final: str):
        import os

        os.replace(tmp, final)  # atomic on POSIX: watchers never see a torn file

    def update(self, gray, frame, slam_map, trajectory=None,
               state_text: str = "", follow_center=None, view: str = "both"):
        import os

        self._n += 1
        if (self._n - 1) % self.every:
            return
        fp = os.path.join(self.out, "live_frame.png")
        mp = os.path.join(self.out, "live_map.png")
        render_frame(gray, frame, fp + ".tmp.png", state_text=state_text)
        self._swap_in(fp + ".tmp.png", fp)
        render_map(slam_map, mp + ".tmp.png", trajectory=trajectory,
                   title=f"map @ frame {self._n - 1}",
                   center=follow_center, view=view)
        self._swap_in(mp + ".tmp.png", mp)
        # interactive 3D scene snapshot (served by ViewerServer /map3d)
        import json as _json

        from . import map3d

        payload = map3d.map_payload(slam_map, trajectory=trajectory,
                                    seq=self._n,
                                    title=f"map @ frame {self._n - 1}")
        j = os.path.join(self.out, "map3d.json")
        with open(j + ".tmp", "w") as f:
            _json.dump(payload, f)
        self._swap_in(j + ".tmp", j)
        if len(self._hist) < self.max_history:
            try:
                from PIL import Image

                im = Image.open(fp).convert("RGB")
                im = im.reduce(self.gif_scale).convert(
                    "P", palette=Image.ADAPTIVE)
                self._hist.append(im)
            except Exception:
                pass

    def close(self):
        """Assemble <out_dir>/session.gif from the rendered history."""
        import os

        if len(self._hist) < 2:
            return None
        path = os.path.join(self.out, "session.gif")
        self._hist[0].save(
            path, save_all=True, append_images=self._hist[1:],
            duration=200, loop=0,
        )
        return path


class ViewerControls:
    """Shared control state between a UI and the tracking loop — the role
    of the reference viewer's menu booleans (/root/reference/src/
    Viewer.cc:176-308: menuFollowCamera, menuTopView/menuCamView,
    menuLocalizationMode, menuReset, menuStep + menuStepByStep, menuStop).

    Synchronous re-design for the thread-free System: the tracker calls
    ``gate()`` at the top of every Track* call; it blocks while paused
    (``step`` releases exactly one frame — the reference's step-by-step
    mode) and the System applies the returned toggles (localization mode,
    reset) itself. All methods are thread-safe; a ViewerServer mutates the
    state from its HTTP thread."""

    COMMANDS = ("pause", "resume", "toggle_pause", "step", "follow_on",
                "follow_off", "toggle_follow", "view_top", "view_side",
                "view_both", "localization_on", "localization_off",
                "toggle_localization", "reset", "stop")

    def __init__(self):
        import threading

        self._cv = threading.Condition()
        self.paused = False
        self.follow = False
        self.view = "both"
        self.localization = False
        self.stopped = False
        self._steps = 0
        self._reset = False

    def command(self, name: str) -> bool:
        """Apply a named command; returns False for unknown names."""
        if name not in self.COMMANDS:
            return False
        with self._cv:
            if name == "pause":
                self.paused = True
            elif name == "resume":
                self.paused = False
            elif name == "toggle_pause":
                self.paused = not self.paused
            elif name == "step":
                self.paused = True
                self._steps += 1
            elif name == "follow_on":
                self.follow = True
            elif name == "follow_off":
                self.follow = False
            elif name == "toggle_follow":
                self.follow = not self.follow
            elif name in ("view_top", "view_side", "view_both"):
                self.view = name[5:]
            elif name == "localization_on":
                self.localization = True
            elif name == "localization_off":
                self.localization = False
            elif name == "toggle_localization":
                self.localization = not self.localization
            elif name == "reset":
                self._reset = True
            elif name == "stop":
                self.stopped = True
            self._cv.notify_all()
        return True

    def gate(self, timeout=None) -> bool:
        """Block while paused (a pending step releases one frame). Returns
        False once `stop` was issued (caller should end the session)."""
        import time as _time

        deadline = None if timeout is None else _time.monotonic() + timeout
        with self._cv:
            while (self.paused and self._steps == 0 and not self.stopped):
                wait = 0.05
                if deadline is not None:
                    wait = min(wait, deadline - _time.monotonic())
                    if wait <= 0:
                        break
                self._cv.wait(wait)
            if self._steps > 0:
                self._steps -= 1
            return not self.stopped

    def consume_reset(self) -> bool:
        with self._cv:
            r, self._reset = self._reset, False
            return r

    def state(self) -> dict:
        with self._cv:
            return {"paused": self.paused, "follow": self.follow,
                    "view": self.view, "localization": self.localization,
                    "stopped": self.stopped, "pending_steps": self._steps}


_PANEL_HTML = """<!doctype html>
<html><head><title>xfeatslam_tpu viewer</title><style>
body {{ font-family: sans-serif; background: #1b1b1f; color: #ddd; }}
img {{ max-width: 48%; border: 1px solid #444; }}
button {{ margin: 2px; padding: 6px 10px; }}
#state {{ font-family: monospace; color: #9c9; }}
</style></head><body>
<h3>xfeatslam_tpu live session</h3>
<div>
<button onclick="cmd('toggle_pause')">pause / resume</button>
<button onclick="cmd('step')">step</button>
<button onclick="cmd('toggle_follow')">follow camera</button>
<button onclick="cmd('view_top')">top view</button>
<button onclick="cmd('view_side')">side view</button>
<button onclick="cmd('view_both')">both views</button>
<button onclick="cmd('toggle_localization')">localization mode</button>
<button onclick="cmd('reset')">reset map</button>
<button onclick="cmd('stop')">stop</button>
<a href="/map3d" target="_blank" style="color:#8cf">3D map</a>
<span id="state"></span>
</div>
<img id="frame" src="/live_frame.png"/>
<img id="map" src="/live_map.png"/>
<script>
async function cmd(n) {{
  const r = await fetch('/cmd?name=' + n, {{method: 'POST'}});
  document.getElementById('state').textContent = await r.text();
}}
setInterval(() => {{
  for (const id of ['frame', 'map'])
    document.getElementById(id).src = '/live_' + id + '.png?t=' + Date.now();
  fetch('/state').then(r => r.text()).then(t =>
    document.getElementById('state').textContent = t);
}}, 700);
</script></body></html>
"""


class ViewerServer:
    """Minimal HTTP UI over a live session: serves the LiveViewer's PNGs
    plus a control panel whose buttons drive a ViewerControls — the
    interaction surface of the reference's Pangolin menu, reachable from
    any browser (this container has no display). stdlib-only.

    Endpoints: GET / (panel), GET /live_frame.png | /live_map.png,
    GET /state (JSON), POST /cmd?name=<ViewerControls.COMMANDS>.
    """

    def __init__(self, out_dir: str, controls: "ViewerControls",
                 port: int = 0, host: str = "127.0.0.1"):
        import http.server
        import json
        import os
        import threading
        import urllib.parse

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def _handle(self):
                u = urllib.parse.urlparse(self.path)
                if u.path == "/":
                    self._send(200, _PANEL_HTML.encode(), "text/html")
                elif u.path == "/map3d":
                    from .map3d import MAP3D_HTML

                    page = MAP3D_HTML.replace("__EMBEDDED__", "null")
                    self._send(200, page.encode(), "text/html")
                elif u.path == "/map3d.json":
                    p = os.path.join(outer.out_dir, "map3d.json")
                    try:
                        with open(p, "rb") as f:
                            self._send(200, f.read(), "application/json")
                    except OSError:
                        self._send(404, b"{}", "application/json")
                elif u.path in ("/live_frame.png", "/live_map.png"):
                    p = os.path.join(outer.out_dir, u.path[1:])
                    try:
                        with open(p, "rb") as f:
                            self._send(200, f.read(), "image/png")
                    except OSError:
                        self._send(404, b"not rendered yet", "text/plain")
                elif u.path == "/state":
                    self._send(200, json.dumps(controls.state()).encode(),
                               "application/json")
                elif u.path == "/cmd":
                    q = urllib.parse.parse_qs(u.query)
                    name = (q.get("name") or [""])[0]
                    ok = controls.command(name)
                    self._send(200 if ok else 400,
                               json.dumps(controls.state()).encode(),
                               "application/json")
                else:
                    self._send(404, b"?", "text/plain")

            do_GET = _handle
            do_POST = _handle

        self.out_dir = out_dir
        self.controls = controls
        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
