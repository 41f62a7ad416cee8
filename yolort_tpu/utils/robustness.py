"""Robustness utilities: timeouts, retries, checkpoint integrity.

Capability parity with the reference's failure-handling surface
(SURVEY.md §5): download retry + resume + sha256 prefix verification
(v5/utils/downloads.py:24-47), the Timeout context manager
(v5/utils/general.py:68).  The downloader (attempt_download) is real,
dependency-free urllib code exercised against loopback HTTP in tests;
actual hub fetches are opt-in via YOLORT_HUB_BASE (zero-egress default).
"""

from __future__ import annotations

import hashlib
import os
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

# Release base the reference publishes its converted checkpoints under
# (yolort/models/yolo.py:271-289 builds per-arch URLs on such a base).
# Overridable so air-gapped deployments can point at a mirror — and so the
# loopback-HTTP tests can exercise the real network path with zero egress.
DEFAULT_HUB_BASE = "https://github.com/zhiqwang/yolov5-rt-stack/releases/download/v0.6.0"


def hub_base() -> Optional[str]:
    """The configured hub base URL, or None when downloads are disabled.

    Downloads are OPT-IN here (unlike the reference, which downloads by
    default): set YOLORT_HUB_BASE to a mirror URL, or to "default" for the
    reference's release registry.  The default-off stance keeps the library
    deterministic in air-gapped/CI environments instead of stalling on a
    blocked socket."""
    base = os.environ.get("YOLORT_HUB_BASE", "")
    if not base:
        return None
    if base.lower() in ("default", "1", "true"):
        return DEFAULT_HUB_BASE
    return base.rstrip("/")


def pretrained_url(arch: str, base: Optional[str] = None) -> Optional[str]:
    """Release-asset URL for an arch's converted COCO checkpoint
    (sha-suffixed name from PRETRAINED_REGISTRY), or None if unknown."""
    base = base if base is not None else hub_base()
    if base is None or arch not in PRETRAINED_REGISTRY:
        return None
    return f"{base}/{PRETRAINED_REGISTRY[arch]}.pt"


def attempt_download(
    url: str,
    dest,
    hash_prefix: Optional[str] = None,
    attempts: int = 3,
    delay: float = 0.5,
    timeout: float = 30.0,
    resume: bool = True,
    min_bytes: int = 1,
    chunk_bytes: int = 1 << 20,
):
    """Download ``url`` to ``dest`` with retry, byte-Range resume, and
    sha256-prefix verification.

    Capability parity with the reference's safe_download/attempt_download
    (v5/utils/downloads.py:24-47: partial-download cleanup, min_bytes
    check, hash verification, curl-style ``-C -`` resume on retry) as one
    dependency-free urllib implementation:

    - data streams into ``dest + '.part'``; a retry resumes from the
      partial via ``Range: bytes=<pos>-`` (servers answering 200 instead
      of 206 restart the file from scratch).  Resume requires a
      ``hash_prefix`` — without one a stale partial cannot be validated,
      so hash-less attempts always restart from byte 0;
    - ``hash_prefix`` defaults to a trailing ``-<hex>`` token parsed from
      the dest filename (the reference embeds it in release names); a
      mismatch discards the file and counts as a failed attempt;
    - on success the part file is atomically renamed to ``dest``.

    Returns the dest Path.  Raises the last error after ``attempts``
    failures (partial data is kept for a future resume unless the hash
    mismatched)."""
    import urllib.error
    import urllib.request

    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    if hash_prefix is None:
        stem = dest.stem
        if "-" in stem:
            candidate = stem.rsplit("-", 1)[-1]
            if len(candidate) >= 6 and all(c in "0123456789abcdef" for c in candidate):
                hash_prefix = candidate
    if dest.exists() and dest.stat().st_size >= min_bytes:
        if hash_prefix is None or sha256_prefix(dest, len(hash_prefix)) == hash_prefix:
            return dest
        dest.unlink()
    if attempts < 1:
        raise ValueError(f"attempts={attempts} must be >= 1")
    part = dest.with_name(dest.name + ".part")
    last: Optional[BaseException] = None
    for i in range(attempts):
        try:
            # Resume only when a hash can validate the assembled file: a
            # pre-existing .part has no freshness proof (no If-Range/ETag
            # state is kept), so without a hash a stale partial from an
            # older remote file would be appended to and renamed into a
            # silently corrupt dest (ADVICE r4).  Hash-less downloads
            # restart from byte 0 every attempt.
            pos = (
                part.stat().st_size
                if (resume and hash_prefix is not None and part.exists())
                else 0
            )
            req = urllib.request.Request(url)
            if pos > 0:
                req.add_header("Range", f"bytes={pos}-")
            with urllib.request.urlopen(req, timeout=timeout) as r:
                if pos > 0 and getattr(r, "status", 200) != 206:
                    pos = 0  # server ignored the Range header: restart
                length = r.headers.get("Content-Length")
                expected = pos + int(length) if length is not None else None
                with open(part, "ab" if pos > 0 else "wb") as f:
                    if pos == 0:
                        f.truncate(0)
                    while True:
                        block = r.read(chunk_bytes)
                        if not block:
                            break
                        f.write(block)
            if expected is not None and part.stat().st_size < expected:
                # mid-stream connection death: urllib can return the short
                # body without raising.  The salvaged bytes are good — keep
                # the partial so the retry resumes instead of restarting.
                raise OSError(
                    f"truncated download: {part.stat().st_size}/{expected} bytes"
                )
            if part.stat().st_size < min_bytes:
                raise OSError(
                    f"downloaded {part.stat().st_size} bytes < min_bytes={min_bytes}"
                )
            if hash_prefix is not None:
                got = sha256_prefix(part, len(hash_prefix))
                if got != hash_prefix:
                    part.unlink()  # poisoned data: do not resume from it
                    raise ValueError(
                        f"sha256 mismatch for {url}: got {got}, want {hash_prefix}"
                    )
            part.replace(dest)
            return dest
        except (OSError, ValueError, urllib.error.URLError) as e:
            last = e
            if isinstance(e, urllib.error.HTTPError) and e.code in (403, 404, 410):
                break  # the asset does not exist; retrying cannot help
            if i < attempts - 1:
                time.sleep(delay * (i + 1))
    raise last
