"""Pallas TPU kernel for greedy NMS suppression.

The batched-NMS semantics the reference gets from torchvision / the
EfficientNMS_TRT plugin (yolort/models/box_head.py:422,
relay/trt_graphsurgeon.py:212) are realized here as a single on-chip kernel
shaped for Mosaic's layout rules:

  * candidates arrive score-sorted with class offsets applied;
  * per T-tile, suppression *reductions are MXU matmuls*: a (1,K) alive row
    times a (K,T) IoU>thr matrix yields the "suppressed by earlier
    candidates" row — no transposes, no cross-lane reshapes, no dynamic
    value slices (all Mosaic-unsupported);
  * within a tile, greedy NMS is computed as a convergent fixed-point
    iteration ``alive <- valid & ~(alive @ sup_upper > 0)``.  Because the
    suppression matrix is strictly upper-triangular in score order, the
    iteration provably converges to the sequential-greedy result (earlier
    indices stabilize first and never flip back);
  * tiles with no live candidates are skipped via @pl.when, so cost scales
    with the actual candidate count (candidates are score-sorted).

The pure-XLA fallback (ops.nms.greedy_nms_mask) computes the same result and
is used on CPU and for verification.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _iou_cols(rows_boxes, cols_boxes_t):
    """IoU between row boxes (M,4) and column boxes given transposed (4,N).

    Returns (M,N). Static slices only."""
    rx1 = rows_boxes[:, 0:1]
    ry1 = rows_boxes[:, 1:2]
    rx2 = rows_boxes[:, 2:3]
    ry2 = rows_boxes[:, 3:4]
    cx1 = cols_boxes_t[0:1, :]
    cy1 = cols_boxes_t[1:2, :]
    cx2 = cols_boxes_t[2:3, :]
    cy2 = cols_boxes_t[3:4, :]
    inter = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1), 0.0) * jnp.maximum(
        jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1), 0.0
    )
    area_r = jnp.maximum(rx2 - rx1, 0.0) * jnp.maximum(ry2 - ry1, 0.0)
    area_c = jnp.maximum(cx2 - cx1, 0.0) * jnp.maximum(cy2 - cy1, 0.0)
    union = area_r + area_c - inter
    return inter / jnp.maximum(union, 1e-12)


def _nms_kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref, *, iou_thresh: float,
                tile: int, stop_after: int):
    k = boxes_t_ref.shape[1]
    num_tiles = k // tile
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    )  # row i suppresses col j>i

    # alive state lives in the output ref ((1,K) f32); init with validity
    keep_ref[:, :] = valid_ref[:, :]

    def tile_body(t, kept):
        start = pl.multiple_of(t * tile, tile)
        tile_valid = keep_ref[:, pl.ds(start, tile)]  # (1,T) f32

        # Early exit: keeps are score-ordered, so once ``stop_after`` of them
        # are finalized the top-``stop_after`` output can no longer change —
        # later tiles keep their validity passthrough (their compaction rank
        # is >= stop_after, so downstream truncation drops them regardless).
        @pl.when((kept < float(stop_after)) & (jnp.sum(tile_valid) > 0.0))
        def _():
            tile_cols = boxes_t_ref[:, pl.ds(start, tile)]  # (4,T)

            # --- suppression by earlier, already-final candidates ---------
            # triangular block walk: only row-tiles s < t can suppress tile t
            # (the suppression matrix is upper-triangular in score order), so
            # per-tile IoU work is (t+1)*T^2 instead of K*T — half the total
            def row_body(s, sup_acc):
                rstart = pl.multiple_of(s * tile, tile)
                alive_row = keep_ref[:, pl.ds(rstart, tile)]  # (1,T) finalized
                iou_st = _iou_cols(boxes_ref[pl.ds(rstart, tile), :], tile_cols)
                sup_st = jnp.where(iou_st > iou_thresh, 1.0, 0.0)
                return sup_acc + jnp.dot(
                    alive_row, sup_st, preferred_element_type=jnp.float32
                )

            sup_prev = jax.lax.fori_loop(
                0, t, row_body, jnp.zeros((1, tile), jnp.float32)
            )
            alive = jnp.where(sup_prev > 0.0, 0.0, tile_valid)  # (1,T)

            # --- within-tile greedy via convergent fixed point ------------
            tile_rows = boxes_ref[pl.ds(start, tile), :]  # (T,4)
            iou_tt = _iou_cols(tile_rows, tile_cols)  # (T,T)
            sup_tt = jnp.where((iou_tt > iou_thresh) & tri, 1.0, 0.0)

            def cond(state):
                _, changed = state
                return changed

            def body(state):
                a, _ = state
                suppressed = jnp.dot(a, sup_tt, preferred_element_type=jnp.float32)
                new_a = jnp.where(suppressed > 0.0, 0.0, alive)
                return new_a, jnp.any(new_a != a)

            final_alive, _ = jax.lax.while_loop(cond, body, (alive, True))
            keep_ref[:, pl.ds(start, tile)] = final_alive

        # post-write tile keep count (skipped tiles contribute their init
        # validity, which is harmless: the gate only re-checks >= stop_after)
        return kept + jnp.sum(keep_ref[:, pl.ds(start, tile)])

    jax.lax.fori_loop(0, num_tiles, tile_body, 0.0)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "tile", "stop_after"))
def pallas_nms_mask(boxes: jax.Array, valid: jax.Array, iou_thresh: float, tile: int = 128,
                    stop_after: int = 0):
    """Greedy NMS keep mask on TPU via Pallas.

    boxes: (K,4) xyxy score-sorted (class offsets pre-applied); valid: (K,).
    K must be a multiple of ``tile`` (itself a multiple of 128 for lane
    alignment).  Returns (K,) bool, identical to ops.nms.greedy_nms_mask.

    stop_after > 0 enables early exit: the mask is exact through the first
    ``stop_after`` keeps; tiles past that point pass their validity through
    (any caller that truncates to the top stop_after detections — e.g.
    detections_per_img compaction — sees identical results at a fraction of
    the tile work).
    """
    k = boxes.shape[0]
    assert k % tile == 0, f"K={k} must be a multiple of tile={tile}"
    assert tile % 128 == 0, f"tile={tile} must be a multiple of 128"
    boxes = boxes.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thresh=iou_thresh, tile=tile,
                          stop_after=stop_after if stop_after > 0 else k),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(boxes, boxes.T, valid.astype(jnp.float32).reshape(1, k))
    return out.reshape(k) > 0.0


def pallas_nms_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() not in ("cpu",)
