"""Hub-style entrypoints (parity with the reference's hubconf.py:4, which
exposes yolov5s for torch.hub).  Here they're plain importable factories:

    from hubconf import yolov5s
    model = yolov5s(pretrained=False, score_thresh=0.45)
"""

from yolort_tpu.models import (  # noqa: F401
    yolov5l,
    yolov5l6,
    yolov5m,
    yolov5m6,
    yolov5n,
    yolov5n6,
    yolov5s,
    yolov5s6,
    yolov5ts,
    yolov5x,
    yolov5x6,
)

dependencies = ["jax", "numpy"]
