"""yolort_tpu — a TPU-native YOLOv5 runtime stack in JAX/XLA/Pallas.

Re-designs the capabilities of zhiqwang/yolort (PyTorch/TensorRT/ONNX) as a
single jit-compiled XLA program: in-graph letterbox preprocessing, CSPDarknet
backbone, PAN neck, detection head, anchor decode and batched NMS.
"""

__version__ = "0.1.0"

from yolort_tpu.models import yolov5n, yolov5s, yolov5m, yolov5l, yolov5x  # noqa: F401
from yolort_tpu.models.yolov5 import YOLOv5  # noqa: F401
