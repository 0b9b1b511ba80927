"""Live MJPEG viewer (slam/live_viewer.py) — the interactive analogue of
the reference's Pangolin window (src/Viewer.cc:56-70) for a headless
remote host. Exercises the real HTTP server end to end: index page,
stats endpoint, and one multipart frame from each stream."""

import json
import urllib.error
import urllib.request

import numpy as np

from iv_slam_tpu.slam.live_viewer import LiveViewer


def _read_one_jpeg(url, timeout=5.0):
    """Read the first multipart JPEG part from an MJPEG stream."""
    with urllib.request.urlopen(url, timeout=timeout) as r:
        assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
        # boundary line
        assert r.readline().strip() == b"--ivframe"
        headers = {}
        while True:
            line = r.readline().strip()
            if not line:
                break
            k, v = line.decode().split(":", 1)
            headers[k.strip().lower()] = v.strip()
        n = int(headers["content-length"])
        data = r.read(n)
    assert data[:2] == b"\xff\xd8"  # JPEG SOI marker
    return data


def test_live_viewer_streams():
    viewer = LiveViewer(port=0).start()
    try:
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[10:20, 10:30] = (0, 255, 0)
        map_img = np.full((64, 64, 3), 40, np.uint8)
        viewer.publish(frame, map_img,
                       stats=dict(frame_id=7, state="OK", n_points=123))

        base = f"http://127.0.0.1:{viewer.port}"
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"frame.mjpg" in page and b"map.mjpg" in page

        stats = json.loads(
            urllib.request.urlopen(base + "/stats.json", timeout=5).read()
        )
        assert stats == {"frame_id": 7, "state": "OK", "n_points": 123}

        jpg_f = _read_one_jpeg(base + "/frame.mjpg")
        jpg_m = _read_one_jpeg(base + "/map.mjpg")
        assert len(jpg_f) > 100 and len(jpg_m) > 100
        # publish keeps streaming: a second frame must arrive
        viewer.publish(frame // 2, None, stats=dict(frame_id=8))
        assert json.loads(
            urllib.request.urlopen(base + "/stats.json", timeout=5).read()
        )["frame_id"] == 8
    finally:
        viewer.stop()


def _post(url, payload, timeout=5.0):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_live_viewer_control_channel():
    """The reference Viewer's menu (src/Viewer.cc:96-102, acted on at
    123-141) as POST /control: view-option toggles land in
    viewer.options (read by the render loop), action controls dispatch
    to registered callbacks (run_stereo wires localization_mode/reset
    to the System API)."""
    calls = []
    viewer = (
        LiveViewer(port=0)
        .register_control("localization_mode",
                          lambda v: calls.append(("loc", v)))
        .register_control("reset", lambda v: calls.append(("reset", v)))
        .start()
    )
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        ctl = json.loads(urllib.request.urlopen(
            base + "/controls.json", timeout=5).read())
        assert ctl["options"]["show_points"] is True
        assert set(ctl["actions"]) == {"localization_mode", "reset"}
        # the index page exposes the controls UI
        assert b"/control" in urllib.request.urlopen(
            base + "/", timeout=5).read()

        status, body = _post(base + "/control",
                             {"action": "show_points", "value": False})
        assert status == 200 and body["ok"]
        assert viewer.options["show_points"] is False

        status, _ = _post(base + "/control",
                          {"action": "localization_mode", "value": True})
        assert status == 200
        status, _ = _post(base + "/control", {"action": "reset"})
        assert status == 200
        assert calls == [("loc", True), ("reset", True)]

        # unknown action is rejected, options untouched
        try:
            _post(base + "/control", {"action": "warp_drive"})
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 422
        assert raised
    finally:
        viewer.stop()
