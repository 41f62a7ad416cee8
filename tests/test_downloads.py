"""Downloader tests — the real network path exercised against a loopback
HTTP server (zero-egress compatible), mirroring the reference's
safe_download/attempt_download contract (v5/utils/downloads.py:24-47):
retry, byte-Range resume, sha256-prefix verification, partial cleanup.
"""

import hashlib
import http.server
import threading
from contextlib import contextmanager

import numpy as np
import pytest

from yolort_tpu.utils.robustness import (
    DEFAULT_HUB_BASE,
    PRETRAINED_REGISTRY,
    attempt_download,
    hub_base,
    pretrained_url,
)

PAYLOAD = bytes(np.random.default_rng(0).integers(0, 256, 300_000, dtype=np.uint8))
SHA8 = hashlib.sha256(PAYLOAD).hexdigest()[:8]


@contextmanager
def _serve(handler_cls):
    with http.server.HTTPServer(("127.0.0.1", 0), handler_cls) as srv:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            yield f"http://127.0.0.1:{srv.server_port}"
        finally:
            srv.shutdown()
            t.join()


class _FullHandler(http.server.BaseHTTPRequestHandler):
    """Serves PAYLOAD; honors Range requests with 206 partial content."""

    range_requests: list = []

    def do_GET(self):
        rng = self.headers.get("Range")
        if rng:
            type(self).range_requests.append(rng)
            start = int(rng.split("=")[1].rstrip("-"))
            body = PAYLOAD[start:]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {start}-{len(PAYLOAD)-1}/{len(PAYLOAD)}"
            )
        else:
            body = PAYLOAD
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_download_and_sha_verify(tmp_path):
    dest = tmp_path / f"weights-{SHA8}.pt"
    with _serve(_FullHandler) as base:
        out = attempt_download(f"{base}/weights.pt", dest)
    assert out == dest and dest.read_bytes() == PAYLOAD
    assert not dest.with_name(dest.name + ".part").exists()


def test_existing_verified_file_not_refetched(tmp_path):
    dest = tmp_path / f"weights-{SHA8}.pt"
    dest.write_bytes(PAYLOAD)

    class _Refuse(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            raise AssertionError("server must not be contacted")

    with _serve(_Refuse) as base:
        out = attempt_download(f"{base}/weights.pt", dest)
    assert out.read_bytes() == PAYLOAD


def test_resume_from_partial(tmp_path):
    _FullHandler.range_requests = []
    dest = tmp_path / f"weights-{SHA8}.pt"
    part = tmp_path / f"weights-{SHA8}.pt.part"
    part.write_bytes(PAYLOAD[: len(PAYLOAD) // 2])
    with _serve(_FullHandler) as base:
        attempt_download(f"{base}/weights.pt", dest)
    assert dest.read_bytes() == PAYLOAD
    assert _FullHandler.range_requests == [f"bytes={len(PAYLOAD)//2}-"]


def test_resume_against_no_range_server_restarts(tmp_path):
    class _NoRange(_FullHandler):
        """Always answers 200 with the full body (ignores Range)."""

        def do_GET(self):
            body = PAYLOAD
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    dest = tmp_path / f"weights-{SHA8}.pt"
    part = tmp_path / f"weights-{SHA8}.pt.part"
    part.write_bytes(b"garbage-prefix")  # must be discarded on the 200 restart
    with _serve(_NoRange) as base:
        attempt_download(f"{base}/weights.pt", dest)
    assert dest.read_bytes() == PAYLOAD


def test_sha_mismatch_raises_and_removes_poison(tmp_path):
    dest = tmp_path / "weights-deadbeef.pt"  # wrong prefix for PAYLOAD
    with _serve(_FullHandler) as base:
        with pytest.raises(ValueError, match="sha256 mismatch"):
            attempt_download(f"{base}/weights.pt", dest, attempts=2, delay=0.01)
    assert not dest.exists()
    assert not dest.with_name(dest.name + ".part").exists()


def test_flaky_server_retry_succeeds(tmp_path):
    class _Flaky(_FullHandler):
        calls = [0]

        def do_GET(self):
            type(self).calls[0] += 1
            if type(self).calls[0] == 1:
                # dying mid-stream: announce full length, send half, drop
                self.send_response(200)
                self.send_header("Content-Length", str(len(PAYLOAD)))
                self.end_headers()
                self.wfile.write(PAYLOAD[: len(PAYLOAD) // 2])
                self.wfile.flush()
                self.connection.close()
                return
            super().do_GET()

    _Flaky.calls = [0]
    _FullHandler.range_requests = []
    dest = tmp_path / f"weights-{SHA8}.pt"
    with _serve(_Flaky) as base:
        attempt_download(f"{base}/weights.pt", dest, attempts=3, delay=0.01)
    assert dest.read_bytes() == PAYLOAD
    assert _Flaky.calls[0] >= 2
    # the retry resumed from the half the first attempt salvaged
    assert any(r.startswith("bytes=") for r in _FullHandler.range_requests)


def test_http_404_raises(tmp_path):
    class _Missing(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_error(404)

        def log_message(self, *a):
            pass

    with _serve(_Missing) as base:
        with pytest.raises(Exception):
            attempt_download(
                f"{base}/nope.pt", tmp_path / "nope.pt", attempts=2, delay=0.01
            )
    assert not (tmp_path / "nope.pt").exists()


def test_hub_base_gating(monkeypatch):
    monkeypatch.delenv("YOLORT_HUB_BASE", raising=False)
    assert hub_base() is None  # zero-egress default: downloads off
    assert pretrained_url("yolov5_darknet_pan_s_r60") is None
    monkeypatch.setenv("YOLORT_HUB_BASE", "default")
    assert hub_base() == DEFAULT_HUB_BASE
    url = pretrained_url("yolov5_darknet_pan_s_r60")
    assert url == f"{DEFAULT_HUB_BASE}/{PRETRAINED_REGISTRY['yolov5_darknet_pan_s_r60']}.pt"
    monkeypatch.setenv("YOLORT_HUB_BASE", "http://127.0.0.1:1/mirror/")
    assert hub_base() == "http://127.0.0.1:1/mirror"


def test_load_pretrained_downloads_from_hub(monkeypatch, tmp_path):
    """End-to-end: factory(pretrained=True) resolves via YOLORT_HUB_BASE
    download when the local cache is empty (reference: yolo.py:271-289)."""
    from yolort_tpu.models import yolov5n
    from yolort_tpu.models._checkpoint import save_params
    from yolort_tpu.models.yolo import build_yolo

    model = build_yolo("yolov5_darknet_pan_n_r60")
    import jax

    params = model.init(jax.random.PRNGKey(7))
    ckpt = tmp_path / "src.npz"
    save_params(str(ckpt), params, {"arch": "yolov5_darknet_pan_n_r60"})
    blob = ckpt.read_bytes()

    class _Hub(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.endswith("yolov5_darknet_pan_n_r60_coco.npz"):
                self.send_response(200)
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    cache = tmp_path / "cache"
    monkeypatch.setenv("YOLORT_TPU_WEIGHTS", str(cache))
    with _serve(_Hub) as base:
        monkeypatch.setenv("YOLORT_HUB_BASE", base)
        m = yolov5n(pretrained=True)
    got = jax.tree_util.tree_leaves(m.params)
    want = jax.tree_util.tree_leaves(params)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
