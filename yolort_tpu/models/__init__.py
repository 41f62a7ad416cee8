"""Model zoo factories (API parity with yolort/models/__init__.py:24-198)."""

from typing import Any

from yolort_tpu.models.yolo import ARCHS, YOLO, build_yolo  # noqa: F401
from yolort_tpu.models.yolov5 import YOLOv5  # noqa: F401


def _factory(arch: str, size_divisible: int = 32):
    def fn(
        upstream_version: str = "r6.0",
        pretrained: bool = False,
        progress: bool = True,
        num_classes: int = 80,
        **kwargs: Any,
    ) -> YOLOv5:
        if upstream_version not in ("r3.1", "r4.0", "r6.0"):
            raise NotImplementedError(f"unsupported upstream version: {upstream_version}")
        resolved = arch.replace("_r60", f"_{upstream_version.replace('.', '')}")
        if resolved not in ARCHS:
            raise NotImplementedError(f"{resolved} is not available")
        return YOLOv5(
            arch=resolved,
            pretrained=pretrained,
            progress=progress,
            num_classes=num_classes,
            size_divisible=size_divisible,
            **kwargs,
        )

    fn.__name__ = arch
    return fn


yolov5n = _factory("yolov5_darknet_pan_n_r60")
yolov5s = _factory("yolov5_darknet_pan_s_r60")
yolov5m = _factory("yolov5_darknet_pan_m_r60")
yolov5l = _factory("yolov5_darknet_pan_l_r60")
yolov5x = _factory("yolov5_darknet_pan_x_r60")
# P6 models run @1280 with stride-64 letterbox rounding
# (reference models/__init__.py:121,140,159 pass size_divisible=64)
yolov5n6 = _factory("yolov5_darknet_pan_n6_r60", size_divisible=64)
yolov5s6 = _factory("yolov5_darknet_pan_s6_r60", size_divisible=64)
yolov5m6 = _factory("yolov5_darknet_pan_m6_r60", size_divisible=64)
yolov5l6 = _factory("yolov5_darknet_pan_l6_r60", size_divisible=64)
yolov5x6 = _factory("yolov5_darknet_pan_x6_r60", size_divisible=64)


def yolov5ts(
    upstream_version: str = "r4.0",
    pretrained: bool = False,
    progress: bool = True,
    num_classes: int = 80,
    **kwargs: Any,
) -> YOLOv5:
    """Transformer-attention small variant (reference models/__init__.py ts)."""
    if upstream_version != "r4.0":
        raise NotImplementedError("TAN currently only supports r4.0")
    return YOLOv5(
        arch="yolov5_darknet_tan_s_r40",
        pretrained=pretrained,
        progress=progress,
        num_classes=num_classes,
        **kwargs,
    )


def yolov5_mobilenet_v3_small_fpn(*args, **kwargs):
    from yolort_tpu.models.yolo_lite import yolov5_mobilenet_v3_small_fpn as fn

    return fn(*args, **kwargs)


__all__ = [
    "YOLO",
    "YOLOv5",
    "build_yolo",
    "yolov5_mobilenet_v3_small_fpn",
    "yolov5n",
    "yolov5s",
    "yolov5m",
    "yolov5l",
    "yolov5x",
    "yolov5n6",
    "yolov5s6",
    "yolov5m6",
    "yolov5l6",
    "yolov5x6",
    "yolov5ts",
]
