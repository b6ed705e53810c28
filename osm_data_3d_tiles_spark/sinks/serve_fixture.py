"""Thin tile-server fixture over engine output — replicates the reference
server's routing/status semantics (/root/reference/serve.ts:31-107) so the pytest
suite can assert them against our materialized tiles:

- path must end in .b3dm or .json, else 400 'Invalid  path' (the double space is
  the reference's literal message, serve.ts:39,58);
- .json: served from the export dir, 404 {"error": "File not found"} if missing;
- .b3dm: 'subtiles/' prefix stripped, the stem must be exactly 3 '_'-separated
  coordinates else 400; pre-generated file served as bytes; a miss is 404 (the
  engine is batch-seeded — the reference's on-demand worker path surfaces its
  B3dmException statuses the same way: 404 for an empty tile,
  b3dmGenerator.ts:116-118).

This is a test fixture, not a production server (SURVEY.md §2.1: the serve loop
is out of engine scope; the engine artifact is the tile table / seeded files).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(export_dir: str):
    class TileHandler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, status: int, body: bytes, ctype: str):
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.lstrip("/")
            if not path.endswith(".b3dm") and not path.endswith(".json"):
                self._send(400, b"Invalid  path", "text/plain")
                return
            if path.endswith(".json"):
                fp = os.path.join(export_dir, path)
                if not os.path.exists(fp):
                    self._send(404, json.dumps({"error": "File not found"}).encode(),
                               "application/json")
                    return
                with open(fp, "rb") as f:
                    self._send(200, f.read(), "application/json")
                return
            # .b3dm
            if path.startswith("subtiles/"):
                path = path[len("subtiles/"):]
            coords = path[: -len(".b3dm")].split("_")
            if len(coords) != 3:
                self._send(400, b"Invalid  path", "text/plain")
                return
            fp = os.path.join(export_dir, "b3dm", path)
            if os.path.exists(fp):
                with open(fp, "rb") as f:
                    self._send(200, f.read(), "application/octet-stream")
            else:
                self._send(404, b"no buildings found", "text/plain")

    return TileHandler


class TileServerFixture:
    """Context manager: serves `export_dir` on an ephemeral localhost port."""

    def __init__(self, export_dir: str):
        self.export_dir = export_dir
        self.server: ThreadingHTTPServer | None = None
        self.port: int | None = None

    def __enter__(self):
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(self.export_dir))
        self.port = self.server.server_address[1]
        t = threading.Thread(target=self.server.serve_forever, daemon=True)
        t.start()
        return self

    def __exit__(self, *exc):
        if self.server:
            self.server.shutdown()
            self.server.server_close()
