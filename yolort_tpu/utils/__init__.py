from yolort_tpu.utils.common import cast_floating, count_params  # noqa: F401
