"""Parity for the fused Pallas cells-concat + stage-1 kernel.

ops/pallas/s1_kernel.py must reproduce `jnp.concatenate(levels, axis=1)`
and `_stage1_per_anchor(cells).reshape(B, -1)` bit-for-bit (same masked
max-reductions, same -1e4 fill, sigmoid product applied outside the kernel
by the same XLA ops).  Runs in interpret mode on the CPU gate; the
on-hardware A/B lives in tools/experiments/s1fused.py.

Reference semantics: yolort/models/box_head.py:388-429 (the score screen
the stage-1 reduction implements).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yolort_tpu.ops.nms import _stage1_per_anchor
from yolort_tpu.ops.pallas.s1_kernel import _plan_blocks, fused_cells_stage1


def _levels(grids, batch, a, kw, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.normal(0.0, 2.5, (batch, h * w, a * kw)).astype(dtype))
        for h, w in grids
    ]


@pytest.mark.parametrize(
    "grids,a,kw",
    [
        # P5 square (yolov5s-like geometry, scaled down)
        ([(8, 8), (4, 4), (2, 2)], 3, 12),
        # rectangular grids (letterboxed non-square input)
        ([(12, 8), (6, 4), (3, 2)], 3, 10),
        # P6 four-level geometry
        ([(16, 16), (8, 8), (4, 4), (2, 2)], 3, 9),
        # single level
        ([(4, 4)], 2, 8),
        # two anchors / tiny kw
        ([(8, 8), (4, 4), (2, 2)], 2, 7),
    ],
)
def test_fused_matches_xla_bitwise(grids, a, kw):
    levels = _levels(grids, batch=2, a=a, kw=kw)
    out = fused_cells_stage1(levels, a, kw, interpret=True)
    assert out is not None
    cells, per = out

    ref_cells = jnp.concatenate(levels, axis=1)
    ref_per = jnp.stack(
        [_stage1_per_anchor(c, a, kw).reshape(-1) for c in ref_cells]
    )
    assert np.array_equal(np.asarray(cells), np.asarray(ref_cells))
    assert np.array_equal(np.asarray(per), np.asarray(ref_per))
    assert per.dtype == ref_per.dtype


def test_fused_bf16_dtype_flow():
    levels = _levels([(8, 8), (4, 4), (2, 2)], 2, 3, 12, dtype=np.float32)
    levels = [lv.astype(jnp.bfloat16) for lv in levels]
    cells, per = fused_cells_stage1(levels, 3, 12, interpret=True)
    ref_cells = jnp.concatenate(levels, axis=1)
    ref_per = jnp.stack(
        [_stage1_per_anchor(c, 3, 12).reshape(-1) for c in ref_cells]
    )
    assert per.dtype == jnp.bfloat16
    assert np.array_equal(
        np.asarray(cells, np.float32), np.asarray(ref_cells, np.float32))
    assert np.array_equal(
        np.asarray(per, np.float32), np.asarray(ref_per, np.float32))


def test_plan_blocks_contract():
    # standard 4x pyramids: blk = second-smallest level, last level partial
    assert _plan_blocks([64, 16, 4]) == (16, [0, 4, 5, 6])
    assert _plan_blocks([256, 64, 16, 4]) == (16, [0, 16, 20, 21, 22])
    # single level: one step
    assert _plan_blocks([40]) == (40, [0, 1])
    # non-multiple middle level -> no plan (caller falls back to XLA)
    assert _plan_blocks([60, 16, 4]) is None
    # last level larger than blk -> no plan
    assert _plan_blocks([16, 16, 32]) is None


def test_fused_fallback_geometry_returns_none():
    # levels whose rows aren't multiples of the second-smallest: kernel
    # refuses and the dispatcher in batched_postprocess_from_heads falls
    # back to the XLA concat (covered via _plan_blocks -> None here)
    rng = np.random.default_rng(0)
    levels = [
        jnp.asarray(rng.normal(size=(1, r, 9)).astype(np.float32))
        for r in (60, 16, 4)
    ]
    assert fused_cells_stage1(levels, 3, 3, interpret=True) is None
