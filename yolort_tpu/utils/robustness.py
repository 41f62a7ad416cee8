"""Robustness utilities: timeouts, retries, checkpoint integrity.

Capability parity with the reference's failure-handling surface
(SURVEY.md §5): download retry + sha256 prefix verification
(v5/utils/downloads.py:24-47), the Timeout context manager
(v5/utils/general.py:68).  Downloads themselves are gated off in this
zero-egress environment; integrity checking applies to local files.
"""

from __future__ import annotations

import hashlib
import signal
import time
from pathlib import Path
from typing import Callable, Optional


class Timeout:
    """Context manager/decorator enforcing a wall-clock limit via SIGALRM."""

    def __init__(self, seconds: float, timeout_msg: str = "", suppress: bool = True):
        self.seconds = seconds
        self.msg = timeout_msg
        self.suppress = suppress

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg or f"operation exceeded {self.seconds}s")

    def __enter__(self):
        self._old = signal.signal(signal.SIGALRM, self._handler)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, exc_type, exc, tb):
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, self._old)
        return self.suppress and exc_type is TimeoutError


def retry(fn: Callable, attempts: int = 3, delay: float = 0.5, exceptions=(Exception,)):
    """Call fn with retries + linear backoff (download-retry analog)."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except exceptions as e:  # noqa: PERF203
            last = e
            if i < attempts - 1:
                time.sleep(delay * (i + 1))
    raise last


def sha256_prefix(path: str, length: int = 8) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:length]


def verify_checkpoint(path: str, hash_prefix: Optional[str] = None) -> bool:
    """Verify a local checkpoint's sha256 prefix (the reference embeds the
    prefix in release filenames, e.g. ...-9f44bf3f.pt, downloads.py:47)."""
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(path)
    if hash_prefix is None:
        # try to parse a trailing -<hex> token from the stem
        stem = p.stem
        if "-" in stem:
            candidate = stem.rsplit("-", 1)[-1]
            if len(candidate) >= 6 and all(c in "0123456789abcdef" for c in candidate):
                hash_prefix = candidate
    if hash_prefix is None:
        return True  # nothing to verify against
    return sha256_prefix(path, len(hash_prefix)) == hash_prefix


# Known COCO-pretrained weight registry (names match the reference's
# model_urls, yolort/models/yolo.py:271-289; files must be pre-seeded
# locally — this environment has no egress).
PRETRAINED_REGISTRY = {
    "yolov5_darknet_pan_s_r31": "yolov5_darknet_pan_s_r31_coco-eb728698",
    "yolov5_darknet_pan_m_r31": "yolov5_darknet_pan_m_r31_coco-670dc553",
    "yolov5_darknet_pan_l_r31": "yolov5_darknet_pan_l_r31_coco-4dcc8209",
    "yolov5_darknet_pan_s_r40": "yolov5_darknet_pan_s_r40_coco-e3fd213d",
    "yolov5_darknet_pan_m_r40": "yolov5_darknet_pan_m_r40_coco-d295cb02",
    "yolov5_darknet_pan_l_r40": "yolov5_darknet_pan_l_r40_coco-4416841f",
    "yolov5_darknet_pan_n_r60": "yolov5_darknet_pan_n_r60_coco-bc15659e",
    "yolov5_darknet_pan_n6_r60": "yolov5_darknet_pan_n6_r60_coco-4e823e0f",
    "yolov5_darknet_pan_s_r60": "yolov5_darknet_pan_s_r60_coco-9f44bf3f",
    "yolov5_darknet_pan_s6_r60": "yolov5_darknet_pan_s6_r60_coco-b4ff1fc2",
    "yolov5_darknet_pan_m_r60": "yolov5_darknet_pan_m_r60_coco-58d32352",
    "yolov5_darknet_pan_m6_r60": "yolov5_darknet_pan_m6_r60_coco-cc010533",
    "yolov5_darknet_pan_l_r60": "yolov5_darknet_pan_l_r60_coco-321d8dcd",
    "yolov5_darknet_tan_s_r40": "yolov5_darknet_tan_s_r40_coco-fe1069ce",
}
