from yolort_tpu.data.coco import COCODetection  # noqa: F401
from yolort_tpu.data.coco_eval import COCOEvaluator  # noqa: F401
from yolort_tpu.data.data_module import DetectionDataModule  # noqa: F401
