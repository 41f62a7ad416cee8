from yolort_tpu.ops import blocks, nms  # noqa: F401
