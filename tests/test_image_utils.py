"""Image I/O + drawing helpers (utils/image_utils.py).

get_image_from_url is exercised against a loopback HTTP server — the
zero-egress environment still allows 127.0.0.1, so the full
fetch->decode->RGB path runs for real (reference helper:
yolort/utils/image_utils.py:93)."""

import http.server
import threading

import numpy as np
import pytest

from yolort_tpu.utils.image_utils import (
    cv2_imshow,
    get_image_from_url,
    overlay_boxes,
    read_image_to_array,
    save_image,
)


@pytest.fixture()
def png_bytes():
    import cv2

    img = np.zeros((16, 24, 3), np.uint8)
    img[:, :, 2] = 200  # red in RGB terms after BGR->RGB flip
    ok, buf = cv2.imencode(".png", img)  # cv2 encodes BGR
    assert ok
    return bytes(buf), img


def test_get_image_from_url_loopback(png_bytes):
    payload, bgr = png_bytes

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    with http.server.HTTPServer(("127.0.0.1", 0), H) as srv:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_port}/img.png"
            rgb = get_image_from_url(url)
            assert rgb.shape == (16, 24, 3)
            # BGR (0,0,200) -> RGB (200,0,0)
            assert rgb[0, 0, 0] == 200 and rgb[0, 0, 2] == 0
            bgr_back = get_image_from_url(url, rgb=False)
            assert bgr_back[0, 0, 2] == 200
        finally:
            srv.shutdown()
            t.join(timeout=5)


def test_get_image_from_url_bad_payload():
    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"not an image")

        def log_message(self, *a):
            pass

    with http.server.HTTPServer(("127.0.0.1", 0), H) as srv:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            with pytest.raises(ValueError, match="could not decode"):
                get_image_from_url(f"http://127.0.0.1:{srv.server_port}/x")
        finally:
            srv.shutdown()
            t.join(timeout=5)


def test_cv2_imshow_headless_fallback(tmp_path):
    """Outside an interactive IPython shell (pytest), the save fallback must
    always be written when requested, even with IPython importable."""
    img = (np.random.default_rng(0).uniform(0, 255, (8, 8, 3))).astype(np.float32)
    out = tmp_path / "shown.png"
    r = cv2_imshow(img, scale=2.0, save_fallback=str(out))
    assert r is None and out.exists()
    back = read_image_to_array(str(out))
    assert back.shape == (16, 16, 3)
    # without a fallback path, the prepared array comes back
    r2 = cv2_imshow(img, scale=2.0)
    assert r2 is not None and r2.shape == (16, 16, 3)


def test_overlay_and_save_roundtrip(tmp_path):
    img = np.zeros((32, 32, 3), np.float32)
    pred = {
        "boxes": np.asarray([[4.0, 4.0, 20.0, 20.0]]),
        "scores": np.asarray([0.9]),
        "labels": np.asarray([0]),
    }
    drawn = overlay_boxes(img, pred)
    assert drawn.dtype == np.uint8 and drawn.any()
    p = tmp_path / "o.png"
    save_image(str(p), drawn)
    assert read_image_to_array(str(p)).shape == (32, 32, 3)
