"""Image I/O + drawing helpers.

Capability parity with yolort/utils/image_utils.py (plot_one_box:24,
read_image_to_tensor:113, overlay_boxes:137) using cv2/PIL, written fresh
for HWC-RGB float arrays.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from yolort_tpu.data.builtin_meta import COCO_CLASSES, class_color


def read_image_to_array(path: str, rgb: bool = True) -> np.ndarray:
    """Read image -> float32 HWC in [0,1] (RGB by default)."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if rgb:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def plot_one_box(img_u8: np.ndarray, box, color=(128, 128, 128), label: Optional[str] = None,
                 line_thickness: Optional[int] = None) -> None:
    """Draw one xyxy box (+label) in place on a uint8 HWC image."""
    import cv2

    tl = line_thickness or max(round(0.002 * (img_u8.shape[0] + img_u8.shape[1]) / 2), 1)
    p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
    cv2.rectangle(img_u8, p1, p2, color, tl, lineType=cv2.LINE_AA)
    if label:
        tf = max(tl - 1, 1)
        w, h = cv2.getTextSize(label, 0, tl / 3, tf)[0]
        p2t = p1[0] + w, p1[1] - h - 3
        cv2.rectangle(img_u8, p1, p2t, color, -1, cv2.LINE_AA)
        cv2.putText(img_u8, label, (p1[0], p1[1] - 2), 0, tl / 3, (255, 255, 255),
                    tf, lineType=cv2.LINE_AA)


def overlay_boxes(
    image: np.ndarray,
    prediction: Dict[str, np.ndarray],
    class_names: Sequence[str] = COCO_CLASSES,
    score_format: str = "{name} {score:.2f}",
) -> np.ndarray:
    """Render a detection dict onto an image; returns uint8 HWC RGB."""
    img = image
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    img = np.ascontiguousarray(img)
    for box, score, label in zip(
        prediction["boxes"], prediction["scores"], prediction["labels"]
    ):
        li = int(label)
        name = class_names[li] if li < len(class_names) else str(li)
        plot_one_box(
            img, box, color=class_color(li), label=score_format.format(name=name, score=float(score))
        )
    return img


def save_image(path: str, image_rgb_u8: np.ndarray) -> None:
    import cv2

    cv2.imwrite(str(path), cv2.cvtColor(image_rgb_u8, cv2.COLOR_RGB2BGR))


def get_image_from_url(
    url: str, rgb: bool = True, timeout: float = 10.0
) -> np.ndarray:
    """Fetch and decode an image from a URL -> uint8 HWC (RGB by default).

    Capability parity with the reference's requests-based helper
    (yolort/utils/image_utils.py:93 get_image_from_url); stdlib urllib so it
    carries no extra dependency.  In a zero-egress environment this works
    against loopback/file URLs (how the test exercises it) and raises a
    clear URLError otherwise.
    """
    import urllib.request

    import cv2

    with urllib.request.urlopen(url, timeout=timeout) as resp:
        buf = np.frombuffer(resp.read(), dtype=np.uint8)
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(f"could not decode image from {url}")
    if rgb:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def cv2_imshow(
    img: np.ndarray,
    scale: Optional[float] = None,
    convert_bgr_to_rgb: bool = False,
    save_fallback: Optional[str] = None,
) -> Optional[np.ndarray]:
    """Notebook-friendly image display (reference image_utils.py:52).

    Displays via IPython only inside a live interactive shell
    (``get_ipython()`` non-None — merely having IPython installed does not
    make the environment displayable).  Otherwise writes ``save_fallback``
    when given, else returns the prepared array — display is an environment
    capability, not a code path worth crashing over.
    """
    import cv2

    img = np.clip(img, 0, 255).astype(np.uint8)
    if convert_bgr_to_rgb and img.ndim == 3:
        code = cv2.COLOR_BGRA2RGBA if img.shape[-1] == 4 else cv2.COLOR_BGR2RGB
        img = cv2.cvtColor(img, code)
    if scale is not None:
        img = cv2.resize(img, None, fx=scale, fy=scale)
    try:
        from IPython import get_ipython
        from IPython.display import display
        from PIL import Image as _PILImage

        if get_ipython() is None:
            raise RuntimeError("not in an interactive IPython shell")
        display(_PILImage.fromarray(img))
        return None
    except Exception:
        if save_fallback:
            save_image(save_fallback, img)
            return None
        return img
