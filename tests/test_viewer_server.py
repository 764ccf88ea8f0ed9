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
