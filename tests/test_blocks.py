"""Block-level shape/value tests, mirroring the reference's
test/test_v5_common.py strategy (random tensors, shape + golden asserts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.ops import blocks as B


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("k,s", [(1, 1), (3, 1), (3, 2), (6, 2)])
def test_conv_shapes(k, s):
    conv = B.Conv(16, 32, k=k, s=s, p=2 if k == 6 else None)
    p = conv.init(jax.random.PRNGKey(0))
    x = rand(1, (2, 64, 64, 16))
    y = conv(p, x)
    assert y.shape == (2, 64 // s, 64 // s, 32)


def test_conv_bn_fold_matches_unfused():
    conv = B.Conv(8, 16, k=3)
    p = conv.init(jax.random.PRNGKey(0))
    # random-ish BN stats
    p["gamma"] = jnp.linspace(0.5, 1.5, 16)
    p["beta"] = jnp.linspace(-1, 1, 16)
    p["mean"] = jnp.linspace(-0.2, 0.3, 16)
    p["var"] = jnp.linspace(0.5, 2.0, 16)
    x = rand(2, (1, 16, 16, 8))
    y_unfused = conv(p, x)
    w_f, b_f = B.fuse_conv_bn(p["w"], p["gamma"], p["beta"], p["mean"], p["var"])
    y_fused = conv({"w": jnp.asarray(w_f), "b": jnp.asarray(b_f)}, x)
    np.testing.assert_allclose(y_unfused, y_fused, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shortcut", [True, False])
def test_bottleneck(shortcut):
    b = B.Bottleneck(32, 32, shortcut=shortcut)
    p = b.init(jax.random.PRNGKey(0))
    x = rand(3, (1, 16, 16, 32))
    assert b(p, x).shape == (1, 16, 16, 32)


@pytest.mark.parametrize("cls", [B.C3, B.BottleneckCSP])
def test_csp_blocks(cls):
    m = cls(32, 64, n=2, shortcut=False)
    p = m.init(jax.random.PRNGKey(0))
    x = rand(4, (2, 16, 16, 32))
    assert m(p, x).shape == (2, 16, 16, 64)


def test_spp_equals_sppf():
    """SPP(5,9,13) computed via chained 5x5 pools == direct pools."""
    x = rand(5, (1, 12, 12, 8))
    y5 = B.max_pool_same(x, 5)
    np.testing.assert_allclose(B.max_pool_same(y5, 5), B.max_pool_same(x, 9), atol=0)
    np.testing.assert_allclose(
        B.max_pool_same(B.max_pool_same(y5, 5), 5), B.max_pool_same(x, 13), atol=0
    )
    spp = B.SPP(16, 32)
    p = spp.init(jax.random.PRNGKey(1))
    x2 = rand(6, (1, 8, 8, 16))
    assert spp(p, x2).shape == (1, 8, 8, 32)


def test_space_to_depth_channel_order():
    """Focus channel order must match the reference concat
    [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2] (common.py:239)."""
    x = np.arange(4 * 4 * 3).reshape(1, 4, 4, 3).astype(np.float32)
    y = np.asarray(B.space_to_depth(jnp.asarray(x)))
    # NCHW reference computation
    xc = x.transpose(0, 3, 1, 2)  # (1,3,4,4)
    ref = np.concatenate(
        [xc[..., ::2, ::2], xc[..., 1::2, ::2], xc[..., ::2, 1::2], xc[..., 1::2, 1::2]], 1
    )
    ref = ref.transpose(0, 2, 3, 1)  # back to NHWC
    np.testing.assert_array_equal(y, ref)


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = B.upsample2x(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]),
                                  np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]]))


def test_activations():
    x = jnp.linspace(-4, 4, 21)
    np.testing.assert_allclose(B.silu(x), x * (1 / (1 + np.exp(-np.asarray(x)))), rtol=1e-6)
    hs = np.asarray(x) * np.clip(np.asarray(x) + 3, 0, 6) / 6
    np.testing.assert_allclose(B.hardswish(x), hs, rtol=1e-6, atol=1e-7)


def test_c3tr_shapes():
    m = B.C3TR(32, 32, n=1)
    p = m.init(jax.random.PRNGKey(0))
    x = rand(7, (1, 8, 8, 32))
    assert m(p, x).shape == (1, 8, 8, 32)
