"""Interactive viewer tests: ViewerControls gating/toggles and the HTTP
panel (ViewerServer). The reference's Pangolin menu surface
(/root/reference/src/Viewer.cc:176-308) re-designed as a browser panel for
a display-less host; these tests drive it over real localhost HTTP."""

import json
import threading
import time
import urllib.request

from xfeatslam_tpu.utils.viewer import ViewerControls, ViewerServer


class TestViewerControls:
    def test_gate_passes_when_not_paused(self):
        c = ViewerControls()
        assert c.gate(timeout=0.1) is True

    def test_pause_blocks_and_step_releases_one_frame(self):
        c = ViewerControls()
        c.command("pause")
        released = []

        def worker():
            for _ in range(3):
                c.gate()
                released.append(time.monotonic())

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        time.sleep(0.15)
        assert released == []  # paused: no frame processed
        c.command("step")
        time.sleep(0.15)
        assert len(released) == 1  # step-by-step: exactly one frame
        c.command("step")
        time.sleep(0.15)
        assert len(released) == 2
        c.command("resume")
        t.join(timeout=1.0)
        assert len(released) == 3

    def test_toggles_and_reset_consume(self):
        c = ViewerControls()
        assert c.command("toggle_localization") and c.localization
        assert c.command("toggle_localization") and not c.localization
        c.command("follow_on")
        c.command("view_side")
        st = c.state()
        assert st["follow"] and st["view"] == "side"
        c.command("reset")
        assert c.consume_reset() is True
        assert c.consume_reset() is False  # one-shot
        assert not c.command("no_such_command")

    def test_stop_unblocks_gate(self):
        c = ViewerControls()
        c.command("pause")
        c.command("stop")
        assert c.gate(timeout=1.0) is False


class TestViewerServer:
    def _get(self, port, path, method="GET"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", method=method)
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, r.read()

    def test_panel_state_and_commands(self, tmp_path):
        c = ViewerControls()
        srv = ViewerServer(str(tmp_path), c, port=0)
        try:
            st, body = self._get(srv.port, "/")
            assert st == 200 and b"step" in body and b"follow" in body

            st, body = self._get(srv.port, "/state")
            assert st == 200 and json.loads(body)["paused"] is False

            st, body = self._get(srv.port, "/cmd?name=pause", method="POST")
            assert st == 200 and c.paused is True
            assert json.loads(body)["paused"] is True

            # image 404 before first render, 200 after
            try:
                st, _ = self._get(srv.port, "/live_map.png")
            except urllib.error.HTTPError as e:
                st = e.code
            assert st == 404
            (tmp_path / "live_map.png").write_bytes(b"\x89PNG fake")
            st, body = self._get(srv.port, "/live_map.png")
            assert st == 200 and body.startswith(b"\x89PNG")
        finally:
            srv.close()

    def test_system_applies_panel_toggles(self, tmp_path):
        """System._apply_viewer_controls honors localization + reset from
        the panel without a full tracking session."""
        from xfeatslam_tpu.ops.camera import Pinhole
        from xfeatslam_tpu.slam.settings import Settings
        from xfeatslam_tpu.slam.system import System

        settings = Settings(
            cam=Pinhole.from_list([525.0, 525.0, 319.5, 239.5]),
            bf=40.0, th_depth=3.0, depth_map_factor=1.0,
        )
        sys_ = System(settings, viewer_dir=str(tmp_path), viewer_port=0,
                      enable_loop_closing=False, backend="orb")
        try:
            c = sys_.viewer_controls
            assert c is not None and sys_.viewer_server.port > 0
            c.command("localization_on")
            sys_._apply_viewer_controls()
            assert sys_.tracking.only_tracking is True
            c.command("localization_off")
            sys_._apply_viewer_controls()
            assert sys_.tracking.only_tracking is False
            c.command("reset")
            sys_._apply_viewer_controls()
            assert sys_.tracking.last_frame is None
        finally:
            sys_.shutdown()


class TestMap3D:
    """Interactive 3D map view (utils/map3d.py) — the MapDrawer/Pangolin
    window role (/root/reference/src/MapDrawer.cc:29-185) as a WebGL page:
    payload encode/decode roundtrip, standalone export, live endpoints."""

    def _map(self):
        import numpy as np

        from xfeatslam_tpu.utils.synthetic import make_loop_map

        slam_map, gt, _ = make_loop_map(np.random.default_rng(0), n_kf=6,
                                        n_pts=120)
        traj = [(float(i), R, t, None) for i, (R, t) in enumerate(gt)]
        return slam_map, traj

    def test_payload_roundtrip(self):
        import numpy as np

        from xfeatslam_tpu.utils import map3d

        slam_map, traj = self._map()
        p = map3d.map_payload(slam_map, trajectory=traj, seq=7)
        d = map3d.decode_payload(p)
        assert p["seq"] == 7
        assert d["pts"].shape == (p["n_pts"], 3) and p["n_pts"] > 0
        assert d["kf_c"].shape == (6, 3) and d["kf_R"].shape == (6, 9)
        # centers match the keyframes'
        kids = sorted(slam_map.keyframes)
        want = np.stack([slam_map.keyframes[k].center() for k in kids])
        np.testing.assert_allclose(d["kf_c"], want, atol=1e-6)
        # rotations are the keyframes' R (row-major), orthonormal
        R0 = d["kf_R"][0].reshape(3, 3)
        np.testing.assert_allclose(R0, slam_map.keyframes[kids[0]].R,
                                   atol=1e-6)
        # covis indices are in range and i<j
        cv = d["covis"]
        assert p["n_covis"] == len(cv)
        if len(cv):
            assert cv.max() < 6 and (cv[:, 0] < cv[:, 1]).all()
        assert d["traj"].shape == (len(traj), 3)

    def test_export_html_standalone(self, tmp_path):
        from xfeatslam_tpu.utils import map3d

        slam_map, traj = self._map()
        p = map3d.map_payload(slam_map, trajectory=traj, seq=1)
        out = map3d.export_html(p, str(tmp_path / "map.html"))
        html = open(out).read()
        assert "__EMBEDDED__" not in html  # data really embedded
        assert p["pts"][:40] in html  # the point buffer is inline
        assert "webgl" in html and "requestAnimationFrame" in html

    def test_served_live(self, tmp_path):
        import json

        from xfeatslam_tpu.utils import map3d
        from xfeatslam_tpu.utils.viewer import ViewerControls, ViewerServer

        slam_map, traj = self._map()
        srv = ViewerServer(str(tmp_path), ViewerControls(), port=0)
        try:
            st, body = TestViewerServer._get(self, srv.port, "/map3d")
            assert st == 200 and b"webgl" in body
            assert b"__EMBEDDED__" not in body  # placeholder substituted
            # no snapshot yet -> 404 with empty JSON body
            try:
                st, body = TestViewerServer._get(self, srv.port,
                                                 "/map3d.json")
            except urllib.error.HTTPError as e:
                st = e.code
            assert st == 404
            p = map3d.map_payload(slam_map, trajectory=traj, seq=3)
            (tmp_path / "map3d.json").write_text(json.dumps(p))
            st, body = TestViewerServer._get(self, srv.port, "/map3d.json")
            assert st == 200 and json.loads(body)["seq"] == 3
            # panel links to the 3D view
            st, body = TestViewerServer._get(self, srv.port, "/")
            assert b"/map3d" in body
        finally:
            srv.close()
