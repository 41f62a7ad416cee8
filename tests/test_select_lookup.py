"""Merge-by-sort slot->chunk lookup vs the compare-reduce reference.

The sort-based lookup inside select_topk_threshold (taken when m*k >= 2^22)
reproduces `sum(off <= s) - 1` through a 2x+flag key merge + cummax; its
tie-handling (chunk entries sorting BEFORE equal-valued slots, duplicate
offsets resolving to the highest chunk id) is load-bearing for exactness.
This pins the full select output on adversarial off patterns — many empty
chunks (duplicate offsets), all-in-one-chunk, and boundary-tie storms —
against masked lax.top_k on domains large enough to engage the sort path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import select_topk_threshold

N = 70 * 4096  # m*k = (2*2240)*512 >= 2^22 engages the merge-by-sort path
K = 512


def _ref(flat, k, thr):
    masked = jnp.where(flat > thr, flat, -1.0)
    v, i = jax.lax.top_k(masked, k)
    ok = v > thr
    return jnp.where(ok, v, -1.0), jnp.where(ok, i, 0)


@pytest.mark.parametrize("pattern", ["clustered", "one_chunk", "tie_storm", "empty"])
def test_sort_lookup_adversarial_patterns(pattern):
    rng = np.random.default_rng(3)
    x = np.zeros(N, np.float32)
    if pattern == "clustered":
        # everything interesting inside a handful of chunks -> long runs of
        # duplicate offsets in `off` (most chunks count 0)
        hot = rng.choice(N // 128, 5, replace=False)
        for c in hot:
            x[c * 128:(c + 1) * 128] = rng.random(128).astype(np.float32)
    elif pattern == "one_chunk":
        x[:128] = rng.random(128).astype(np.float32) * 0.9 + 0.1
    elif pattern == "tie_storm":
        # thousands of entries share the exact boundary value
        x[:] = 0.25
        x[rng.choice(N, 200, replace=False)] = 0.75
    else:  # empty: nothing above threshold
        x[:] = 0.001
    xv = jnp.asarray(x)
    v1, i1 = jax.jit(lambda t: select_topk_threshold(t, K, 0.005))(xv)
    v0, i0 = jax.jit(lambda t: _ref(t, K, 0.005))(xv)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    if pattern != "tie_storm":
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    else:
        # ties resolve in index order (documented contract); the selected
        # VALUE multiset must still match exactly
        np.testing.assert_array_equal(np.sort(np.asarray(i0)), np.sort(np.asarray(i1)))


def test_sort_and_cmpred_paths_agree():
    """Force both lookup paths on the same data via k (m*k straddles the
    threshold) and pin them against each other through the public output."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random(N, dtype=np.float32))
    # k=512 -> sort path; k=64 -> compare-reduce path; top-64 of the k=512
    # result must equal the k=64 result exactly
    v_big, i_big = jax.jit(lambda t: select_topk_threshold(t, 512, 0.005))(x)
    v_small, i_small = jax.jit(lambda t: select_topk_threshold(t, 64, 0.005))(x)
    np.testing.assert_array_equal(np.asarray(v_big)[:64], np.asarray(v_small))
    np.testing.assert_array_equal(np.asarray(i_big)[:64], np.asarray(i_small))
