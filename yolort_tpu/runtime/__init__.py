from yolort_tpu.runtime.aot import AOTPredictor, export_aot, load_aot  # noqa: F401
