"""Default per-jit XLA compiler options for TPU backends.

The first compiler-lever sweep in this repo (round 5,
tools/experiments/xlaflags.py) measured `xla_tpu_scoped_vmem_limit_kib`
— the budget XLA's fusion pass may assume for operands it keeps
VMEM-resident inside one fusion — against the shipping e2e programs on
v5e (chained timing, calibrated density, A/A/B reproducibility ±1-4
img/s):

    config                     default     32 MiB     40 MiB
    serving bf16  @640 b128     3922        3936      3968   (+1.2%)
    serving int8  @640 b128     4700        4839      4880   (+3.8%)
    eval bf16     @640 b128     2211        2221      2229   (+0.8%)
    P6 bf16      @1280 b128      948         982       989   (+4.3%)
    P6 int8      @1280 b128     1189        1210      1213   (+2.0%)

The response is NOT smooth in the budget — 36 MiB craters the serving
program to 3608 (-8%) while 32 and 40 both win: each budget flips a
discrete set of fusion decisions, so only measured points count (do not
interpolate).  Past ~half the 128 MiB physical VMEM the deeper fusions
evict the double-buffering headroom the DMA pipeline needs (64 MiB
-1.6%, 96 MiB -5.5%), and the latency-hiding scheduler is neutral
single-chip.  40 MiB is the measured sweet spot across every shipped
config, biggest exactly where programs are fusion-starved at the
default budget (int8's requant/dequant glue, P6's 1280² elementwise
tails).

Applied at every production jit site (predict, mesh infer/train,
streaming, AOT predictor, bench).  `YOLORT_XLA_VMEM_KIB` overrides the
value; `0` disables the option entirely.  Non-TPU backends get None —
the option namespace is TPU-only and CPU test runs must not see it.

Reference analogue: the TensorRT builder knobs the reference exposes per
engine (workspace size, /root/reference/yolort/runtime/trt_helper.py) —
here it is one measured default instead of a user-facing tunable.
"""

from __future__ import annotations

import os

_VMEM_KIB_DEFAULT = 40960


def tpu_compiler_options() -> dict[str, str] | None:
    """Compiler options for ``jax.jit(..., compiler_options=...)``.

    Returns None (jit's default) on non-TPU backends or when disabled
    via ``YOLORT_XLA_VMEM_KIB=0``.  Import-light: only queries the
    backend when jax is already importable (always true in-package).
    """
    try:
        kib = int(os.environ.get("YOLORT_XLA_VMEM_KIB", _VMEM_KIB_DEFAULT))
    except ValueError:
        kib = _VMEM_KIB_DEFAULT
    if kib <= 0:
        return None
    import jax

    try:
        backend = jax.default_backend()
    except Exception:  # backend init failure: let the real jit call surface it
        return None
    if backend not in ("tpu", "axon"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
