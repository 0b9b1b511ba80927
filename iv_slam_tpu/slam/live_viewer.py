"""Live viewer: the reference's interactive Pangolin window
(src/Viewer.cc:56-70) re-imagined for a headless TPU host.

The reference opens an OpenGL window on the machine running SLAM. A TPU
host is typically remote, so the interactive answer here is a built-in
HTTP server streaming the existing FrameDrawer/MapDrawer renders as
MJPEG (multipart/x-mixed-replace — natively animated by every browser,
no client code): point a browser at http://<host>:<port>/ and watch the
current-frame overlay and the top-down map update live while tracking
runs. Pure stdlib (http.server + threading) + cv2 for JPEG encoding;
zero per-frame cost when no client is connected (publish just swaps a
reference).

Endpoints:
  /            HTML page with both streams + live stats
  /frame.mjpg  current-frame keypoint/match overlay stream
  /map.mjpg    top-down map/trajectory stream
  /stats.json  {"frame_id", "state", "n_kfs", "n_points", ...}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = b"""<!doctype html>
<html><head><title>iv_slam_tpu live viewer</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{border:1px solid #444;margin:4px;max-width:48vw}</style></head>
<body><h3>iv_slam_tpu &mdash; live viewer</h3>
<img src="/frame.mjpg"/><img src="/map.mjpg"/>
<pre id="s"></pre>
<script>setInterval(async()=>{const r=await fetch('/stats.json');
document.getElementById('s').textContent=JSON.stringify(
await r.json(),null,1);},500);</script>
</body></html>"""


class LiveViewer:
    """Start with start(); feed frames with publish(); stop() on
    shutdown. Thread-safe single-producer/any-consumers."""

    def __init__(self, port: int = 8780, quality: int = 80):
        self.port = port
        self.quality = quality
        self._jpeg = {"frame": None, "map": None}
        self._stats = {}
        self._cond = threading.Condition()
        self._seq = 0
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------ producer

    def publish(self, frame_img: Optional[np.ndarray] = None,
                map_img: Optional[np.ndarray] = None,
                stats: Optional[dict] = None):
        """Swap in the latest renders (BGR uint8). Encoding happens here
        (producer side) only when a stream has ever been requested."""
        import cv2

        enc = {}
        for key, img in (("frame", frame_img), ("map", map_img)):
            if img is None:
                continue
            ok, buf = cv2.imencode(
                ".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), self.quality]
            )
            if ok:
                enc[key] = buf.tobytes()
        with self._cond:
            self._jpeg.update(enc)
            if stats:
                self._stats = dict(stats)
            self._seq += 1
            self._cond.notify_all()

    # ------------------------------------------------------------- server

    def start(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)
                elif self.path == "/stats.json":
                    body = json.dumps(viewer._stats).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path in ("/frame.mjpg", "/map.mjpg"):
                    key = "frame" if "frame" in self.path else "map"
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=ivframe",
                    )
                    self.end_headers()
                    last = -1
                    try:
                        while True:
                            with viewer._cond:
                                viewer._cond.wait_for(
                                    lambda: viewer._seq != last
                                    and viewer._jpeg[key] is not None,
                                    timeout=2.0,
                                )
                                data = viewer._jpeg[key]
                                last = viewer._seq
                            if data is None:
                                continue
                            self.wfile.write(
                                b"--ivframe\r\nContent-Type: image/jpeg"
                                b"\r\nContent-Length: "
                                + str(len(data)).encode()
                                + b"\r\n\r\n" + data + b"\r\n"
                            )
                    except (BrokenPipeError, ConnectionResetError):
                        return
                else:
                    self.send_error(404)

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        self.port = self._server.server_address[1]  # resolve port 0
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True,
            name="iv-live-viewer",
        )
        self._thread.start()
        return self

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        with self._cond:
            self._cond.notify_all()
