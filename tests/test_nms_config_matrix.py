"""Cross-axis parity matrix for the postprocess option zoo.

Every NMSConfig axis is parity-tested pointwise elsewhere; this test covers
the INTERACTIONS (VERDICT r3 weak #5): multi-axis combinations across the
three dispatch paths (default / lane-padded / cell-major) must all produce
bit-identical Detections to the all-XLA baseline.  Pallas kernel options run
in interpret mode on the CPU runner.

Reference semantics unchanged throughout: yolort/models/box_head.py:388-429.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import batched_postprocess_from_heads

NC = 7
A = 3
GRIDS = ((8, 8), (4, 4), (2, 2))
STRIDES = (8, 16, 32)
ANCHOR_GRIDS = (
    (10.0, 13.0, 16.0, 30.0, 33.0, 23.0),
    (30.0, 61.0, 62.0, 45.0, 59.0, 119.0),
    (116.0, 90.0, 156.0, 198.0, 373.0, 326.0),
)
BATCH = 3

BASE = dict(
    flatten_pad=False, selection="two_stage", topk_impl="topk",
    anchor_arith=False, payload_boxes=False, row_gather="xla",
    box_gather="xla", cell_gather="xla", s1_impl="sortidx",
    s1_select="sortidx", stage2="flat80", nms_impl="xla",
)

# curated multi-axis combinations per dispatch path (each axis value also
# appears in at least one combo that flips a second axis)
COMBOS = [
    # default path: selection impls x gather options x anchor arithmetic
    dict(topk_impl="bisect", anchor_arith=True),
    dict(topk_impl="sort", payload_boxes=True),
    dict(topk_impl="bisect", row_gather="mxu", box_gather="mxu"),
    dict(topk_impl="bisect", row_gather="pallas", box_gather="pallas",
         anchor_arith=True),
    dict(topk_impl="bisect", row_gather="pallas_bisect", payload_boxes=True),
    # lane-padded path
    dict(flatten_pad=True, topk_impl="bisect"),
    dict(flatten_pad=True, topk_impl="bisect", s1_impl="compact",
         anchor_arith=True),
    dict(flatten_pad=True, topk_impl="bisect", stage2="row128"),
    dict(flatten_pad=True, topk_impl="bisect", stage2="row128",
         row_gather="pallas"),
    # cell-major path: kernel fetch options x cell/box gathers
    dict(flatten_pad="cell", topk_impl="bisect"),
    dict(flatten_pad="cell", topk_impl="bisect", anchor_arith=True),
    dict(flatten_pad="cell", topk_impl="bisect", cell_gather="pallas"),
    dict(flatten_pad="cell", topk_impl="bisect", row_gather="pallas",
         box_gather="pallas", cell_gather="pallas"),
    dict(flatten_pad="cell", topk_impl="bisect", row_gather="pallas_select"),
    dict(flatten_pad="cell", topk_impl="bisect", row_gather="pallas_full",
         cell_gather="pallas"),
    dict(flatten_pad="cell", topk_impl="bisect", row_gather="pallas_bisect",
         box_gather="pallas"),
    dict(flatten_pad="cell", topk_impl="bisect", row_gather="pallas_lookup"),
    dict(flatten_pad="cell", topk_impl="bisect", s1_impl="precat"),
    dict(flatten_pad="cell", topk_impl="bisect", s1_impl="precat",
         anchor_arith=True, row_gather="pallas_bisect"),
    # single-stage selection
    dict(selection="single", topk_impl="bisect"),
    dict(selection="single", topk_impl="sort", anchor_arith=True),
    # s1_select (round-5 default flip: compact at serving k1) crossed with
    # the kernel fetches and the precat stage-1
    dict(flatten_pad="cell", topk_impl="bisect", s1_select="compact"),
    dict(flatten_pad="cell", topk_impl="bisect", s1_select="compact",
         anchor_arith=True, row_gather="pallas_bisect"),
    dict(flatten_pad="cell", topk_impl="bisect", s1_select="compact",
         s1_impl="precat", cell_gather="pallas"),
    # fused Pallas concat+stage-1 (round-5 kernel, interpret mode on CPU)
    # crossed with both selects and the kernel fetches
    dict(flatten_pad="cell", topk_impl="bisect", s1_impl="fused"),
    dict(flatten_pad="cell", topk_impl="bisect", s1_impl="fused",
         s1_select="compact", anchor_arith=True),
    dict(flatten_pad="cell", topk_impl="bisect", s1_impl="fused",
         row_gather="pallas_bisect", cell_gather="pallas"),
]

# Seeded randomized sweep over the legal cross-product (VERDICT r4 weak #6:
# the curated combos cover ~20 of a few-hundred legal combinations, and each
# default flip multiplies the untested product).  The seed is fixed so the
# sampled set is stable across runs; bump SWEEP_SEED deliberately to rotate
# coverage.  Axis spaces are per dispatch path (an axis not consumed by a
# path is not sampled there).
SWEEP_SEED = 20260820
SWEEP_N = 12

_DEFAULT_AXES = dict(
    topk_impl=["topk", "bisect", "sort"],
    s1_impl=["sortidx", "compact"],
    anchor_arith=[False, True],
    payload_boxes=[False, True],
    row_gather=["xla", "mxu", "pallas", "pallas_select", "pallas_full",
                "pallas_bisect", "pallas_lookup"],
    box_gather=["xla", "mxu", "pallas"],
)
_PADDED_AXES = dict(_DEFAULT_AXES, stage2=["flat80", "row128"])
_CELL_AXES = dict(
    topk_impl=["topk", "bisect", "sort"],
    s1_impl=["cells", "precat", "fused"],
    s1_select=["sortidx", "compact"],
    anchor_arith=[False, True],
    row_gather=["xla", "mxu", "pallas", "pallas_select", "pallas_full",
                "pallas_bisect", "pallas_lookup"],
    box_gather=["xla", "mxu", "pallas"],
    cell_gather=["xla", "pallas"],
)
_SINGLE_AXES = dict(
    topk_impl=["topk", "bisect", "sort"],
    anchor_arith=[False, True],
)
_PATH_SPACES = [
    (dict(flatten_pad=False), _DEFAULT_AXES),
    (dict(flatten_pad=True), _PADDED_AXES),
    (dict(flatten_pad="cell"), _CELL_AXES),
    (dict(selection="single"), _SINGLE_AXES),
]


def _sample_sweep():
    rng = np.random.default_rng(SWEEP_SEED)
    seen = {tuple(sorted(c.items())) for c in COMBOS}
    out = []
    while len(out) < SWEEP_N:
        fixed, axes = _PATH_SPACES[int(rng.integers(len(_PATH_SPACES)))]
        combo = dict(fixed)
        for name, values in axes.items():
            combo[name] = values[int(rng.integers(len(values)))]
        key = tuple(sorted(combo.items()))
        if key not in seen:
            seen.add(key)
            out.append(combo)
    return out


SWEEP_COMBOS = _sample_sweep()


def _head_outputs():
    rng = np.random.default_rng(7)
    outs = []
    for (h, w) in GRIDS:
        # logits spread wide enough that a realistic fraction of obj*cls
        # scores crosses the threshold; distinct values (no tie storms —
        # those are pinned in test_select_indices.py)
        outs.append(jnp.asarray(
            rng.normal(0.0, 2.0, (BATCH, h, w, A * (5 + NC))).astype(np.float32)))
    return outs


def _run(heads, **overrides):
    kw = dict(BASE)
    kw.update(overrides)
    return batched_postprocess_from_heads(
        heads, STRIDES, ANCHOR_GRIDS, num_classes=NC,
        score_thresh=0.05, nms_thresh=0.45, detections_per_img=32,
        pre_nms_topk=64, nms_tile_size=64, **kw,
    )


@pytest.fixture(scope="module")
def baseline():
    heads = _head_outputs()
    det = jax.device_get(_run(heads))
    assert int(det.num.min()) > 0, "degenerate scene: no detections to compare"
    return heads, det


def _assert_parity(det, ref):
    np.testing.assert_array_equal(det.num, ref.num)
    for i in range(BATCH):
        n = int(ref.num[i])
        np.testing.assert_array_equal(det.labels[i][:n], ref.labels[i][:n])
        np.testing.assert_array_equal(det.scores[i][:n], ref.scores[i][:n])
        np.testing.assert_array_equal(det.boxes[i][:n], ref.boxes[i][:n])


@pytest.mark.parametrize("combo", COMBOS, ids=lambda c: ",".join(
    f"{k}={v}" for k, v in sorted(c.items())))
def test_config_matrix_bit_parity(baseline, combo):
    heads, ref = baseline
    _assert_parity(jax.device_get(_run(heads, **combo)), ref)


@pytest.mark.parametrize("combo", SWEEP_COMBOS, ids=lambda c: ",".join(
    f"{k}={v}" for k, v in sorted(c.items())))
def test_config_sweep_bit_parity(baseline, combo):
    heads, ref = baseline
    _assert_parity(jax.device_get(_run(heads, **combo)), ref)
