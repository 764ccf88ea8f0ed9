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
               max_points: int = 20000):
    """Top-down (x-z) + side (x-y) map render: points, keyframe frusta,
    covisibility edges, optional frame trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    alive = slam_map.points.alive[: slam_map.points.n]
    X = slam_map.points.pos[: slam_map.points.n][alive][:max_points]
    centers = {k: kf.center() for k, kf in slam_map.keyframes.items()}

    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    for ax, (i, j, name) in zip(axes, [(0, 2, "x-z (top)"), (0, 1, "x-y (side)")]):
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
               state_text: str = ""):
        import os

        self._n += 1
        if (self._n - 1) % self.every:
            return
        fp = os.path.join(self.out, "live_frame.png")
        mp = os.path.join(self.out, "live_map.png")
        render_frame(gray, frame, fp + ".tmp.png", state_text=state_text)
        self._swap_in(fp + ".tmp.png", fp)
        render_map(slam_map, mp + ".tmp.png", trajectory=trajectory,
                   title=f"map @ frame {self._n - 1}")
        self._swap_in(mp + ".tmp.png", mp)
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
