"""HTTP job API — the reference's REST contract on the stdlib HTTP server.

Endpoints identical to the reference (backend/app/api/v1/endpoints/
jobs.py:15-108, main.py:20-22):

    GET  /health
    POST /v1/jobs                          multipart or raw audio upload
    GET  /v1/jobs/{id}                     status JSON
    GET  /v1/jobs/{id}/result.json
    GET  /v1/jobs/{id}/musicxml
    GET  /v1/jobs/{id}/score.pdf
    GET  /v1/jobs/{id}/transcription.mid
    GET  /v1/jobs/{id}/note_events.csv

Implementation is dependency-free (ThreadingHTTPServer); jobs are enqueued
to the file queue for workers, or run inline in a background thread when
JOB_WORKERS=0 is not set and no worker is attached (CELERY_ENABLED=0
inline semantics of jobs.py:49-59 are preserved via ?inline=1).

    python -m audiotabs_tpu.runtime.server [--port 8000]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import threading
from email.parser import BytesParser
from email.policy import default as email_default
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .. import config
from .jobs import JobManager

_ARTIFACTS = {
    "result.json": ("out/result.json", "application/json"),
    "musicxml": ("out/result.musicxml", "application/vnd.recordare.musicxml+xml"),
    "score.pdf": ("out/score.pdf", "application/pdf"),
    "transcription.mid": ("out/transcription.mid", "audio/midi"),
    "note_events.csv": ("out/note_events.csv", "text/csv"),
    "tab_positions.json": ("out/tab_positions.json", "application/json"),
}

_JOB_RE = re.compile(r"^/v1/jobs/([0-9a-f]{32})(?:/(.+))?$")


def _parse_multipart(headers, body: bytes) -> tuple[bytes, str] | None:
    ctype = headers.get("Content-Type", "")
    if "multipart/form-data" not in ctype:
        return None
    msg = BytesParser(policy=email_default).parsebytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body
    )
    for part in msg.iter_parts():
        if part.get_content_disposition() == "form-data":
            filename = part.get_filename() or "upload.wav"
            return part.get_payload(decode=True), filename
    return None


class _Handler(BaseHTTPRequestHandler):
    manager: JobManager = None  # set by serve()

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if config.settings.FRONTEND_ORIGIN:
            self.send_header("Access-Control-Allow-Origin", config.settings.FRONTEND_ORIGIN)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            return self._json(200, {"status": "ok"})
        static = {
            "/": ("index.html", "text/html; charset=utf-8"),
            "/index.html": ("index.html", "text/html; charset=utf-8"),
            "/score_renderer.js": ("score_renderer.js", "text/javascript; charset=utf-8"),
        }
        if self.path in static:
            from pathlib import Path

            name, mime = static[self.path]
            page = Path(__file__).resolve().parent.parent.parent / "frontend" / name
            if page.exists():
                body = page.read_bytes()
                self.send_response(200)
                self.send_header("Content-Type", mime)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            return self._json(404, {"detail": "frontend not bundled"})
        m = _JOB_RE.match(self.path.split("?")[0])
        if not m:
            return self._json(404, {"detail": "not found"})
        job_id, artifact = m.group(1), m.group(2)
        job_dir = self.manager.storage.data_dir / "jobs" / job_id
        if not job_dir.exists():
            return self._json(404, {"detail": "job not found"})
        if artifact is None:
            status = self.manager.storage.get_status(job_id)
            return self._json(
                200,
                {"job_id": job_id, "status": status.get("status", "unknown"), "error": status.get("error")},
            )
        if artifact not in _ARTIFACTS:
            return self._json(404, {"detail": "unknown artifact"})
        rel, mime = _ARTIFACTS[artifact]
        path = job_dir / rel
        if not path.exists():
            return self._json(404, {"detail": f"{artifact} not ready"})
        data = path.read_bytes()
        self.send_response(200)
        self.send_header("Content-Type", mime)
        self.send_header("Content-Length", str(len(data)))
        if config.settings.FRONTEND_ORIGIN:
            self.send_header("Access-Control-Allow-Origin", config.settings.FRONTEND_ORIGIN)
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):
        if self.path.split("?")[0] != "/v1/jobs":
            return self._json(404, {"detail": "not found"})
        length = int(self.headers.get("Content-Length", 0))
        if length > config.settings.MAX_UPLOAD_MB * 1024 * 1024:
            return self._json(413, {"detail": "upload too large"})
        body = self.rfile.read(length)
        parsed = _parse_multipart(self.headers, body)
        if parsed is None:
            filename = self.headers.get("X-Filename", "upload.wav")
            payload = body
        else:
            payload, filename = parsed
        if not payload:
            return self._json(400, {"detail": "empty upload"})
        try:
            job_id = self.manager.create_job(payload, filename)
        except ValueError as exc:
            return self._json(413, {"detail": str(exc)})

        from urllib.parse import parse_qs, urlparse

        query = parse_qs(urlparse(self.path).query)
        if query.get("inline", ["0"])[0] == "1":
            outcome = self.manager.run_inline(job_id)
            return self._json(200, {"job_id": job_id, "status": outcome.get("status", "error")})
        self.manager.enqueue(job_id)
        return self._json(200, {"job_id": job_id, "status": "queued"})


def serve(port: int = 8000, data_dir: str | None = None, *, background: bool = False):
    _Handler.manager = JobManager(data_dir)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), _Handler)
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()
    return httpd


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="audiotabs_tpu job API server")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args(argv)
    print(f"serving on :{args.port}")
    serve(args.port, args.data_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
