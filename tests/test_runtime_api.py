import http.client
import io
import json
import time

import numpy as np
import pytest

from audiotabs_tpu.io import write_wav


def _wav_bytes(dur=2.0, sr=22050):
    t = np.arange(int(sr * dur)) / sr
    y = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    y[: 300] += 0.2 * np.random.default_rng(0).standard_normal(300).astype(np.float32)
    buf = io.BytesIO()
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        pass
    write_wav(f.name, y, sr)
    data = open(f.name, "rb").read()
    os.unlink(f.name)
    return data


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import socket

    from audiotabs_tpu.runtime.server import serve

    data_dir = tmp_path_factory.mktemp("srv_data")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(port, str(data_dir), background=True)
    yield port, data_dir
    httpd.shutdown()


def _request(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_health(server):
    port, _ = server
    status, ctype, data = _request(port, "GET", "/health")
    assert status == 200
    assert json.loads(data) == {"status": "ok"}


def test_job_lifecycle_inline(server, monkeypatch):
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "2")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    port, data_dir = server
    wav = _wav_bytes()
    status, _, data = _request(
        port, "POST", "/v1/jobs?inline=1", body=wav, headers={"X-Filename": "song.wav"}
    )
    assert status == 200
    job = json.loads(data)
    job_id = job["job_id"]

    status, _, data = _request(port, "GET", f"/v1/jobs/{job_id}")
    info = json.loads(data)
    assert info["status"] == "done", info

    status, ctype, data = _request(port, "GET", f"/v1/jobs/{job_id}/result.json")
    assert status == 200
    result = json.loads(data)
    assert result["job_id"] == job_id
    assert "tempo_bpm" in result

    status, ctype, data = _request(port, "GET", f"/v1/jobs/{job_id}/musicxml")
    assert status == 200 and b"score-partwise" in data

    status, _, data = _request(port, "GET", f"/v1/jobs/{job_id}/transcription.mid")
    assert status == 200 and data[:4] == b"MThd"

    status, _, data = _request(port, "GET", f"/v1/jobs/{job_id}/note_events.csv")
    assert status == 200 and data.startswith(b"start_time_s")


def test_queue_and_worker(server):
    port, data_dir = server
    wav = _wav_bytes(dur=1.0)
    status, _, data = _request(port, "POST", "/v1/jobs", body=wav, headers={"X-Filename": "q.wav"})
    job_id = json.loads(data)["job_id"]

    status, _, data = _request(port, "GET", f"/v1/jobs/{job_id}")
    assert json.loads(data)["status"] == "queued"

    # drain the queue with a worker (inline call of the worker main loop)
    from audiotabs_tpu.runtime.worker import main as worker_main

    worker_main(["--data-dir", str(data_dir), "--once"])

    status, _, data = _request(port, "GET", f"/v1/jobs/{job_id}")
    assert json.loads(data)["status"] in ("done", "error")


def test_unknown_job_and_artifact(server):
    port, _ = server
    status, _, _ = _request(port, "GET", "/v1/jobs/" + "0" * 32)
    assert status == 404
    status, _, _ = _request(port, "GET", "/v1/jobs/not-a-job")
    assert status == 404


def test_upload_cap(server, monkeypatch):
    monkeypatch.setenv("MAX_UPLOAD_MB", "0")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    port, _ = server
    status, _, data = _request(port, "POST", "/v1/jobs", body=b"x" * 2048)
    assert status == 413
    monkeypatch.delenv("MAX_UPLOAD_MB")
    reload_settings()


def test_multipart_upload(server):
    port, _ = server
    wav = _wav_bytes(dur=0.5)
    boundary = "testboundary42"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="m.wav"\r\n'
        f"Content-Type: audio/wav\r\n\r\n"
    ).encode() + wav + f"\r\n--{boundary}--\r\n".encode()
    status, _, data = _request(
        port,
        "POST",
        "/v1/jobs",
        body=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    assert status == 200
    assert "job_id" in json.loads(data)


def test_frontend_served_offline(server):
    """The page and the bundled SVG score renderer must be served locally
    (the reference's ScoreViewer/LeadSheet equivalents work with no CDN)."""
    port, _ = server
    code, _ct, page = _request(port, "GET", "/")
    assert code == 200
    html = page.decode()
    assert "score_renderer.js" in html
    code, _ct, js = _request(port, "GET", "/score_renderer.js")
    assert code == 200
    src = js.decode()
    for sym in ("renderScore", "renderLeadSheet", "renderTab", "AudiotabsScore"):
        assert sym in src
    # the offline Tablature view wiring: a Tab button on the page, the
    # renderer exported, and the artifact route it fetches
    assert 'data-view="tab"' in html
    assert "tab_positions.json" in html
