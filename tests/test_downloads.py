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


def test_stale_partial_without_hash_is_discarded(tmp_path):
    """No hash => no resume: a stale .part cannot be validated against the
    remote, so the download restarts from byte 0 instead of appending a
    fresh tail onto old bytes (ADVICE r4)."""
    _FullHandler.range_requests = []
    dest = tmp_path / "weights.pt"  # no parseable hash in the name
    part = tmp_path / "weights.pt.part"
    part.write_bytes(b"stale bytes from an older remote file")
    with _serve(_FullHandler) as base:
        attempt_download(f"{base}/weights.pt", dest)
    assert dest.read_bytes() == PAYLOAD
    assert _FullHandler.range_requests == []  # never sent a Range header


def test_attempts_below_one_rejected(tmp_path):
    with pytest.raises(ValueError, match="attempts=0"):
        attempt_download("http://127.0.0.1:1/x.pt", tmp_path / "x.pt", attempts=0)


def test_load_pretrained_downloads_registry_pt_only(monkeypatch, tmp_path):
    """End-to-end: factory(pretrained=True) downloads ONLY the registry-named
    sha-suffixed .pt asset, with the hash passed explicitly — never a
    plain-name (unverifiable) file (reference flow yolo.py:271-289; ADVICE
    r4 medium: no unverified fallthrough into torch.load)."""
    import jax

    from tests.torch_fixture import make_checkpoint
    from yolort_tpu.models import yolov5n
    from yolort_tpu.models._checkpoint import load_from_ultralytics
    from yolort_tpu.utils import robustness

    ckpt = tmp_path / "src.pt"
    make_checkpoint(str(ckpt), nc=80, dm=0.33, wm=0.25, seed=5)
    blob = ckpt.read_bytes()
    sha8 = hashlib.sha256(blob).hexdigest()[:8]
    reg_name = f"yolov5_darknet_pan_n_r60_coco-{sha8}"
    monkeypatch.setitem(
        robustness.PRETRAINED_REGISTRY, "yolov5_darknet_pan_n_r60", reg_name
    )
    requested: list = []

    class _Hub(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            requested.append(self.path)
            if self.path.endswith(f"{reg_name}.pt"):
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
    assert requested and all(p.endswith(f"{reg_name}.pt") for p in requested)
    want = load_from_ultralytics(str(ckpt))["params"]
    got_l = jax.tree_util.tree_leaves(m.params)
    want_l = jax.tree_util.tree_leaves(want)
    assert len(got_l) == len(want_l)
    for g, w in zip(got_l, want_l):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_hub_sha_tamper_raises_without_fallthrough(monkeypatch, tmp_path):
    """A sha256 mismatch on the registry asset is a tamper signal: the
    loader raises instead of swallowing it and fetching something
    unverified (ADVICE r4 medium)."""
    from yolort_tpu.models._checkpoint import load_pretrained_params
    from yolort_tpu.utils import robustness

    reg_name = "yolov5_darknet_pan_n_r60_coco-deadbeef"
    monkeypatch.setitem(
        robustness.PRETRAINED_REGISTRY, "yolov5_darknet_pan_n_r60", reg_name
    )
    requested: list = []

    class _Evil(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            requested.append(self.path)
            body = b"not the weights that were published" * 64
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    monkeypatch.setenv("YOLORT_TPU_WEIGHTS", str(tmp_path / "cache"))
    with _serve(_Evil) as base:
        monkeypatch.setenv("YOLORT_HUB_BASE", base)
        with pytest.raises(ValueError, match="sha256 mismatch"):
            load_pretrained_params("yolov5_darknet_pan_n_r60", None)
    assert requested and all(p.endswith(f"{reg_name}.pt") for p in requested)
