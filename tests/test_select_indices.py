"""select_topk_indices (sort-compaction stage-1) and the row128 stage-2.

select_topk_indices must return exactly the index SET (and slot occupancy)
that select_topk_threshold(..., sort=False) returns — strictly-above
entries first in index order, boundary ties filling the remaining slots in
index order.  The row128 stage-2 (chunk == anchor at full lane width with
payload-carried boxes) must produce bit-identical Detections to the flat80
stage-2 it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.ops.nms import select_topk_indices, select_topk_threshold


def _ref_sets(flat, k, thresh=0.0):
    vals, idx = select_topk_threshold(jnp.asarray(flat), k, thresh, sort=False)
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    ok = vals >= 0.0
    return set(idx[ok].tolist()), int(ok.sum()), idx, ok


@pytest.mark.parametrize(
    "case",
    [
        "uniform",
        "tie_storm",
        "few_valid",
        "all_invalid",
        "exact_k",
        "boundary_ties",
    ],
)
def test_matches_select_topk_threshold(case):
    rng = np.random.default_rng(hash(case) % 2**32)
    n, k = 25344, 4096
    if case == "uniform":
        flat = rng.random(n).astype(np.float32)
    elif case == "tie_storm":
        flat = rng.choice([0.1, 0.2, 0.3], n).astype(np.float32)
    elif case == "few_valid":
        flat = np.zeros(n, np.float32)
        flat[rng.choice(n, 37, replace=False)] = rng.random(37).astype(np.float32)
    elif case == "all_invalid":
        flat = np.zeros(n, np.float32)
    elif case == "exact_k":
        flat = np.zeros(n, np.float32)
        flat[rng.choice(n, k, replace=False)] = rng.random(k).astype(np.float32) + 0.5
    else:  # boundary_ties: the k-th value repeated many times across the cut
        flat = rng.random(n).astype(np.float32)
        flat[rng.choice(n, 600, replace=False)] = np.float32(0.5)

    ref_set, ref_count, ref_idx, ref_okm = _ref_sets(flat, k)
    ok, idx = jax.jit(lambda f: select_topk_indices(f, k))(jnp.asarray(flat))
    ok = np.asarray(ok)
    idx = np.asarray(idx)
    assert int(ok.sum()) == ref_count
    assert set(idx[ok].tolist()) == ref_set
    # occupancy is a prefix
    assert not np.any(~ok[: int(ok.sum())])
    # same ORDER contract as the reference (gt tier then eq tier, index order)
    np.testing.assert_array_equal(idx[ok], ref_idx[ref_okm])


def test_threshold_respected():
    n, k = 2048, 256
    rng = np.random.default_rng(0)
    flat = rng.random(n).astype(np.float32) * 0.01  # most below 0.005
    ok, idx = select_topk_indices(jnp.asarray(flat), k, score_thresh=0.005)
    ok = np.asarray(ok)
    idx = np.asarray(idx)
    above = np.where(flat > 0.005)[0]
    expect = min(len(above), k)
    assert int(ok.sum()) == expect
    assert set(idx[ok].tolist()) <= set(above.tolist())


@pytest.mark.parametrize("seed", [0, 7])
def test_cell_major_matches_default(seed):
    """flatten_pad='cell' (conv-layout stage-1 + segment extract) must be
    bit-identical to the unpadded default path on the same head outputs."""
    from yolort_tpu.ops.nms import batched_postprocess_from_heads

    rng = np.random.default_rng(seed)
    nc, na = 80, 3
    grids = [(8, 8), (4, 4), (2, 2)]
    strides = (8, 16, 32)
    anchor_grids = (
        (10.0, 13.0, 16.0, 30.0, 33.0, 23.0),
        (30.0, 61.0, 62.0, 45.0, 59.0, 119.0),
        (116.0, 90.0, 156.0, 198.0, 373.0, 326.0),
    )
    heads = [
        jnp.asarray(
            rng.standard_normal((2, h, w, na * (5 + nc))).astype(np.float32) * 2.0 - 2.0
        )
        for h, w in grids
    ]
    kw = dict(
        num_classes=nc,
        score_thresh=0.05,
        nms_thresh=0.45,
        detections_per_img=30,
        pre_nms_topk=128,
        topk_impl="bisect",
    )
    a = batched_postprocess_from_heads(
        heads, strides, anchor_grids, flatten_pad="cell", **kw
    )
    b = batched_postprocess_from_heads(
        heads, strides, anchor_grids, flatten_pad=False, **kw
    )
    for fa, fb, name in zip(a, b, a._fields):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb), err_msg=name)


def test_cell_major_matches_default_p6_and_odd_nc():
    """Cell path parity on a 4-level (P6) head with nc != 80 and A != 3 —
    the segmented stage-1 and segment extract must stay generic over level
    count, anchor count, and class count."""
    from yolort_tpu.ops.nms import batched_postprocess_from_heads

    rng = np.random.default_rng(11)
    nc, na = 13, 4
    grids = [(8, 8), (4, 4), (2, 2), (1, 1)]
    strides = (8, 16, 32, 64)
    anchor_grids = tuple(
        tuple(float(v) for v in rng.uniform(8, 300, na * 2)) for _ in grids
    )
    heads = [
        jnp.asarray(
            rng.standard_normal((2, h, w, na * (5 + nc))).astype(np.float32) * 2.0 - 2.0
        )
        for h, w in grids
    ]
    kw = dict(
        num_classes=nc,
        score_thresh=0.05,
        nms_thresh=0.45,
        detections_per_img=25,
        pre_nms_topk=96,
        topk_impl="bisect",
    )
    a = batched_postprocess_from_heads(
        heads, strides, anchor_grids, flatten_pad="cell", **kw
    )
    b = batched_postprocess_from_heads(
        heads, strides, anchor_grids, flatten_pad=False, **kw
    )
    for fa, fb, name in zip(a, b, a._fields):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb), err_msg=name)


@pytest.mark.parametrize("seed", [0, 3])
def test_row128_stage2_matches_flat80(seed):
    """Padded-path stage-2 variants produce identical Detections."""
    from yolort_tpu.models.head import PAD_LOGIT, padded_num_outputs
    from yolort_tpu.ops.nms import batched_postprocess_from_padded_heads

    rng = np.random.default_rng(seed)
    nc, na = 80, 3
    grids = [(8, 8), (4, 4), (2, 2)]
    strides = (8, 16, 32)
    anchor_grids = (
        (10.0, 13.0, 16.0, 30.0, 33.0, 23.0),
        (30.0, 61.0, 62.0, 45.0, 59.0, 119.0),
        (116.0, 90.0, 156.0, 198.0, 373.0, 326.0),
    )
    kp = padded_num_outputs(5 + nc)
    heads = []
    for h, w in grids:
        x = rng.standard_normal((2, h, w, na * kp)).astype(np.float32) * 2.0 - 2.0
        x = x.reshape(2, h, w, na, kp)
        x[..., 5 + nc:] = PAD_LOGIT
        heads.append(jnp.asarray(x.reshape(2, h, w, na * kp)))

    kw = dict(
        num_classes=nc,
        score_thresh=0.05,
        nms_thresh=0.45,
        detections_per_img=30,
        pre_nms_topk=128,
        s1_impl="sortidx",
    )
    a = batched_postprocess_from_padded_heads(
        heads, strides, anchor_grids, stage2="row128", **kw
    )
    b = batched_postprocess_from_padded_heads(
        heads, strides, anchor_grids, stage2="flat80", **kw
    )
    for fa, fb, name in zip(a, b, a._fields):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb), err_msg=name)
