"""Pallas TPU kernel for greedy NMS suppression.

The batched-NMS semantics the reference gets from torchvision / the
EfficientNMS_TRT plugin (yolort/models/box_head.py:422,
relay/trt_graphsurgeon.py:212) are realized here as a single on-chip kernel:

  * candidates arrive score-sorted with class offsets already applied;
  * the (K,K) IoU work is tiled: each T-row tile is first suppressed by all
    previously-finalized candidates (vectorized (T,K) IoU on the VPU), then
    self-suppressed with an in-register sequential scan — T steps of (1,T)
    vector ops with no XLA loop overhead;
  * tiles whose candidates are all below the score threshold are skipped via
    @pl.when — since candidates are sorted, cost scales with the *actual*
    candidate count, not the padded K.

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


def _iou_rows(tile_boxes, all_boxes):
    """IoU between (T,4) and (K,4) -> (T,K), matching ops.nms.box_iou_matrix."""
    tx1, ty1, tx2, ty2 = (tile_boxes[:, i : i + 1] for i in range(4))  # (T,1)
    ax1, ay1, ax2, ay2 = (all_boxes[None, :, i] for i in range(4))  # (1,K)
    lt_x = jnp.maximum(tx1, ax1)
    lt_y = jnp.maximum(ty1, ay1)
    rb_x = jnp.minimum(tx2, ax2)
    rb_y = jnp.minimum(ty2, ay2)
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    area_t = jnp.maximum(tx2 - tx1, 0.0) * jnp.maximum(ty2 - ty1, 0.0)
    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    union = area_t + area_a - inter
    return inter / jnp.maximum(union, 1e-12)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_thresh: float, tile: int):
    k = boxes_ref.shape[0]
    num_tiles = k // tile
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1,K)
    tri_row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    tri_col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    tri = tri_row < tri_col  # i suppresses j>i

    # alive state lives in the output ref; init with validity
    keep_ref[:] = valid_ref[:]

    def tile_body(t, _):
        start = t * tile
        tile_valid = keep_ref[pl.ds(start, tile)].reshape(1, tile)  # (1,T)

        @pl.when(jnp.any(tile_valid))
        def _():
            tile_boxes = boxes_ref[pl.ds(start, tile), :]
            iou = _iou_rows(tile_boxes, boxes_ref[:, :])  # (T,K)
            sup = iou > iou_thresh
            # suppression by earlier, already-final candidates
            prev_mask = (col_idx < start) & (keep_ref[:].reshape(1, k) != 0)
            sup_prev = jnp.sum(
                jnp.where(sup & prev_mask, 1, 0), axis=1, keepdims=True
            )  # (T,1)
            alive = (tile_valid.reshape(tile, 1) != 0) & (sup_prev == 0)  # (T,1)

            # in-register sequential greedy within the tile
            sup_tt = sup[:, start : start + tile] & tri  # (T,T)

            def inner(i, alive):
                row = jax.lax.dynamic_slice(sup_tt, (i, 0), (1, tile))  # (1,T)
                alive_i = jax.lax.dynamic_slice(alive, (i, 0), (1, 1))[0, 0]
                kill = row.reshape(tile, 1) & alive_i
                return alive & jnp.logical_not(kill)

            alive = jax.lax.fori_loop(0, tile, inner, alive)
            keep_ref[pl.ds(start, tile)] = alive.reshape(tile).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "tile"))
def pallas_nms_mask(boxes: jax.Array, valid: jax.Array, iou_thresh: float, tile: int = 128):
    """Greedy NMS keep mask on TPU via Pallas.

    boxes: (K,4) xyxy score-sorted (class offsets pre-applied); valid: (K,).
    K must be a multiple of ``tile``. Returns (K,) bool, identical to
    ops.nms.greedy_nms_mask.
    """
    k = boxes.shape[0]
    assert k % tile == 0, f"K={k} must be a multiple of tile={tile}"
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thresh=iou_thresh, tile=tile),
        out_shape=jax.ShapeDtypeStruct((k,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(boxes.astype(jnp.float32), valid.astype(jnp.int32))
    return out != 0


def pallas_nms_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() not in ("cpu",)
