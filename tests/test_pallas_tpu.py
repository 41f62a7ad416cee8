"""Pallas TPU kernel tests — run only when a TPU backend is available.

(The CPU suite covers the XLA fallback; these pin the kernel itself. They
were also executed manually on the axon chip during development.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu",), reason="needs a TPU backend"
)


def _random_candidates(seed, k=1024, n_valid=None):
    rng = np.random.default_rng(seed)
    cxy = rng.uniform(0, 640, (k, 2))
    wh = rng.uniform(5, 200, (k, 2))
    boxes = np.clip(np.concatenate([cxy - wh / 2, cxy + wh / 2], 1), 0, 640).astype(np.float32)
    valid = np.ones(k, bool)
    if n_valid is not None:
        valid[n_valid:] = False
    return boxes, valid


@pytest.mark.parametrize("seed,k,tile", [(0, 1024, 128), (1, 2048, 128), (2, 2048, 256)])
def test_pallas_matches_xla(seed, k, tile):
    from yolort_tpu.ops.nms import greedy_nms_mask
    from yolort_tpu.ops.pallas.nms_kernel import pallas_nms_mask

    boxes, valid = _random_candidates(seed, k, n_valid=int(k * 0.7))
    got = np.asarray(pallas_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.45, tile=tile))
    ref = np.asarray(
        jax.jit(lambda b, v: greedy_nms_mask(b, v, 0.45, tile_size=tile))(
            jnp.asarray(boxes), jnp.asarray(valid)
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_pallas_all_invalid():
    from yolort_tpu.ops.pallas.nms_kernel import pallas_nms_mask

    boxes, valid = _random_candidates(3, 512)
    valid[:] = False
    got = np.asarray(pallas_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.45))
    assert not got.any()


@pytest.mark.parametrize(
    "k,n,h,w,c,co",
    [(1, 2, 20, 20, 64, 128), (3, 2, 20, 20, 64, 128), (3, 2, 80, 80, 64, 64),
     (3, 2, 160, 160, 32, 32)],
)
def test_qconv_compiled_bit_exact(k, n, h, w, c, co):
    """Fused-epilogue int8 conv, compiled on hardware, vs the XLA int8 path:
    integer accumulation must be bit-exact (both s8xs8->s32 exact), epilogue
    f32 on both sides here."""
    from yolort_tpu.ops.blocks import conv2d_nhwc
    from yolort_tpu.ops.pallas import qconv as Q

    rng = np.random.default_rng(k * 10 + h)
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w, c), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-10, 11, (k, k, c, co), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (co,)).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-1, 1, (co,)).astype(np.float32))
    ios = jnp.float32(6.0)
    out = Q.qconv(xq, wq, scale, bias, k=k, act="silu", inv_out_scale=ios)
    acc = conv2d_nhwc(xq, wq, stride=1, padding=k // 2,
                      preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale + bias
    y = y * jax.nn.sigmoid(y)
    ref = jnp.clip(jnp.round(y * ios), -127.0, 127.0).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
