from yolort_tpu.utils.common import cast_floating, count_params  # noqa: F401
from yolort_tpu.utils.compile_options import tpu_compiler_options  # noqa: F401
from yolort_tpu.utils.dependency import (  # noqa: F401
    check_version,
    is_module_available,
    requires_module,
)

__all__ = [
    "cast_floating",
    "count_params",
    "tpu_compiler_options",
    "check_version",
    "is_module_available",
    "requires_module",
]
