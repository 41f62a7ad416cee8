"""Post-training quantization (PTQ) for yolort_tpu params.

Capability parity with the reference's INT8 PTQ deployment flow
(deployment/ppq — ProgramPQ calibration + quantized TensorRT engines),
re-designed for TPU:

  * **Weights** are quantized to int8 with per-output-channel symmetric
    scales and stored as (int8 values, f32 scales) — 4x smaller
    checkpoints/HBM footprint for weights.
  * At run time weights are dequantized into the compute dtype on the fly
    (XLA fuses the dequant multiply into the convolution's operand path);
    activations stay in bf16 — on TPU the MXU's native bf16 throughput makes
    activation-int8 unnecessary for this model family, so PTQ here is a
    memory/storage optimization with ~zero accuracy cost.
  * Optional calibration utilities compute activation ranges for users who
    export to int8-native targets.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_tensor_per_channel(w: np.ndarray, axis: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 quantization with per-channel scales along ``axis``."""
    w = np.asarray(w, np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = np.abs(w).max(axis=reduce_axes, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale)


def dequantize_tensor(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_tensor_per_channel (scale broadcast on last axis)."""
    return q.astype(dtype) * scale.astype(dtype)


def quantize_params(params: Dict, min_size: int = 512) -> Dict:
    """Quantize conv/linear weights ('w' leaves, >= min_size elements) to
    {'q': int8, 'scale': f32}; other leaves pass through."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and not isinstance(v, dict) and np.asarray(v).size >= min_size:
                    q, scale = quantize_tensor_per_channel(np.asarray(v))
                    out["w"] = {"q": jnp.asarray(q), "scale": jnp.asarray(scale)}
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def dequantize_params(params: Dict, dtype=jnp.bfloat16) -> Dict:
    """Materialize a quantized pytree back to dense weights in ``dtype``.

    Kept as jnp ops so it can run inside jit — XLA fuses the dequant into
    the first use of each weight."""

    def walk(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "scale"}:
                return dequantize_tensor(node["q"], node["scale"], dtype)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantization_error(params: Dict, qparams: Dict) -> Dict[str, float]:
    """Max relative weight error introduced by PTQ, per top-level group."""
    out = {}
    deq = dequantize_params(qparams, jnp.float32)
    for key in params:
        orig = jax.tree_util.tree_leaves(params[key])
        new = jax.tree_util.tree_leaves(deq[key])
        errs = [
            float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
            for a, b in zip(orig, new)
            if a.shape == b.shape
        ]
        out[key] = max(errs) if errs else 0.0
    return out


# ---------------------------------------------------------------------------
# int8 *compute* path (MXU s8xs8->s32, ~2x bf16 throughput on v5e)
# ---------------------------------------------------------------------------

def calibrate_activations(apply_fn, params: Dict, batches) -> Dict:
    """Run ``apply_fn(params, batch)`` eagerly over calibration batches while
    every Conv records the abs-max of its input into its own params leaf
    (``_absmax``).  Analogue of the reference ppq flow's calibration pass
    (deployment/ppq/quantize.py).  Runs on CPU (eager, one-time); returns the
    annotated params (numpy-backed).
    """
    from yolort_tpu.ops import blocks

    params = jax.device_get(params)  # uncommit from any accelerator
    cpu = jax.devices("cpu")[0]
    # calibrate on an f32 copy: CPU eager bf16 is emulated (minutes per
    # 640-px batch on one core), and abs-max ranges are insensitive to the
    # compute dtype at PTQ noise level.  The recorded ranges are copied back
    # onto the caller's tree so its own dtypes are untouched.
    cal = jax.tree_util.tree_map(
        lambda l: np.asarray(l, np.float32)
        if str(np.asarray(l).dtype) == "bfloat16" else np.asarray(l),
        params,
    )
    blocks._CALIBRATION = True
    try:
        with jax.default_device(cpu):
            for batch in batches:
                b = jnp.asarray(jax.device_get(batch))
                if jnp.issubdtype(b.dtype, jnp.floating):
                    b = b.astype(jnp.float32)
                apply_fn(cal, b)
    finally:
        blocks._CALIBRATION = False

    def copy_marks(src, dst):
        if isinstance(src, dict):
            for k, v in src.items():
                if k in ("_absmax", "_out_absmax", "_add_absmax"):
                    dst[k] = v
                elif isinstance(v, dict):
                    copy_marks(v, dst[k])

    copy_marks(cal, params)
    return params


def _is_conv_leaf(node: Dict) -> bool:
    return (
        isinstance(node, dict)
        and "w" in node
        and not isinstance(node["w"], dict)
        and np.asarray(node["w"]).ndim == 4
    )


def quantize_compute_params(
    params: Dict,
    skip: Tuple[str, ...] = (),
    min_reduce: int = 32,
    predicate=None,
    chain: bool = True,
) -> Dict:
    """Convert calibrated conv leaves to the int8-compute form
    ``{'wq': int8 HWIO, 'ws': (O,) f32, 'xs': () f32, 'b': f32}`` understood
    by ``ops.blocks.Conv/Conv2dOnly`` (s8 conv -> s32 -> fused f32 epilogue).

    Leaves are quantized only when (a) calibration recorded an input range,
    (b) the reduction depth kh*kw*cin_per_group >= ``min_reduce`` (skips
    depthwise convs, where int8 buys nothing and the error is largest), and
    (c) the leaf's '/'-joined path doesn't start with an entry of ``skip``.
    Unfused-BN leaves are folded first (fuse_conv_bn).  ``_absmax`` markers
    are stripped from the output either way.
    """
    from yolort_tpu.ops.blocks import fuse_conv_bn

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        if _is_conv_leaf(node):
            out = {k: v for k, v in node.items() if k not in ("_absmax", "_out_absmax")}
            amax = node.get("_absmax")
            out_amax = node.get("_out_absmax")
            w = np.asarray(node["w"], np.float32)
            kh, kw, cin_g, _ = w.shape
            p_str = "/".join(path)
            if (
                amax is None
                or amax <= 0.0
                or kh * kw * cin_g < min_reduce
                or any(p_str.startswith(s) for s in skip)
                or (predicate is not None and not predicate(p_str, w.shape))
            ):
                return out
            if "gamma" in node:  # fold eval-mode BN before quantizing
                w, b = fuse_conv_bn(
                    w, node["gamma"], node["beta"], node["mean"], node["var"]
                )
            else:
                b = np.asarray(node["b"], np.float32) if "b" in node else None
            out = {}
            wq, ws = quantize_tensor_per_channel(w, axis=-1)
            out["wq"] = jnp.asarray(wq)
            out["ws"] = jnp.asarray(np.atleast_1d(ws), jnp.float32)
            out["xs"] = jnp.asarray(float(amax) / 127.0, jnp.float32)
            if chain and out_amax is not None and out_amax > 0.0:
                # the epilogue requantizes to int8 under this post-activation
                # scale, so downstream quantized convs read int8 straight
                # from HBM (the actual bandwidth win)
                out["os"] = jnp.asarray(float(out_amax) / 127.0, jnp.float32)
            if b is not None:
                out["b"] = jnp.asarray(b, jnp.float32)
            return out
        out = {}
        for k, v in node.items():
            if k == "_add_absmax":
                # calibrated post-residual-add range -> the 'as' scale that
                # blocks._qadd requantizes the int8 sum to (instead of the
                # resolution-losing sa+sb upper bound)
                if chain and float(v) > 0.0:
                    out["as"] = jnp.asarray(float(v) / 127.0, jnp.float32)
            else:
                out[k] = walk(v, path + (k,))
        return out

    return walk(params, ())


def finalize_scales(apply_fn, params: Dict, example) -> Dict:
    """Freeze the quantized tree's activation scales into trace-time
    constants and unify every concat group's output scales.

    Two measured facts motivate this (docs/PERF.md):
      * with scales as runtime f32 params, XLA cannot fold the
        ``q * (s/common)`` rescale at concat boundaries and each one
        materializes a full read+write pass over every part — the "int8
        glue" residue between the model's 16.3 ms and its 11.5 ms traffic
        floor;
      * scales never change after calibration, so nothing is lost by
        baking them into the compiled program.

    Pass 1 runs ``apply_fn(params, example)`` EAGERLY (tiny example is
    fine — scale routing is shape-independent) with ``blocks._UNIFY``
    recording, per concat, the identity of each part's scale leaf.  Pass 2
    union-finds those groups (a tensor reused by two concats — e.g. PAN
    backbone features — transitively merges them), takes each group's max,
    and rewrites every ``os``/``as``/``xs`` leaf as a
    :class:`~yolort_tpu.ops.blocks.StaticScale` holding the (possibly
    raised) value.  Raising a producer's output scale to the group max
    costs at most one rounding bit on that tensor (the harness in
    tests/test_int8_ap_delta.py bounds the AP effect); in exchange every
    concat in the graph becomes a pure int8 concatenation with NO rescale
    pass.  Analogue of the reference ppq flow baking calibrated scales
    into the engine (deployment/ppq/quantize.py).
    """
    from yolort_tpu.ops import blocks

    # the quantized tree's non-quantized leaves may be bf16 (serving dtype);
    # the discovery pass must feed the example in that same floating dtype or
    # the first conv raises a dtype mismatch (scale routing is dtype-agnostic)
    float_dt = next(
        (l.dtype for l in jax.tree_util.tree_leaves(params)
         if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
         and l.dtype != jnp.float32),
        jnp.float32,
    )

    groups: list = []
    blocks._UNIFY = groups
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            apply_fn(params, jnp.asarray(example, float_dt))
    finally:
        blocks._UNIFY = None

    # union-find over scale-leaf identity
    parent: Dict[int, int] = {}
    val: Dict[int, float] = {}

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for grp in groups:
        ids = []
        for s in grp:
            i = id(s)
            if i not in parent:
                parent[i] = i
                val[i] = float(jnp.asarray(_sv_of(s)))
            ids.append(i)
        r0 = find(ids[0])
        for i in ids[1:]:
            r = find(i)
            if r != r0:
                parent[r] = r0
    group_max: Dict[int, float] = {}
    for i in parent:
        r = find(i)
        group_max[r] = max(group_max.get(r, 0.0), val[i])

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("xs", "os", "as") and not isinstance(v, dict):
                    i = id(v)
                    if i in parent:
                        out[k] = blocks.StaticScale(group_max[find(i)])
                    else:
                        out[k] = blocks.StaticScale(float(jnp.asarray(v)))
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def _sv_of(s):
    from yolort_tpu.ops.blocks import _sv

    return _sv(s)


def strip_calibration(params: Dict) -> Dict:
    """Drop ``_absmax`` markers (so the pytree is jit-clean) without
    quantizing."""

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items() if k not in ("_absmax", "_out_absmax", "_add_absmax")}
        return node

    return walk(params)


def quant_groups(params: Dict, depth: int = 2) -> Tuple[str, ...]:
    """The '/'-joined path prefixes (at ``depth``) containing calibrated conv
    leaves — the granularity at which ``sensitivity_scan`` toggles
    quantization and ``quantize_compute_params(skip=...)`` excludes layers."""
    groups = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if _is_conv_leaf(node) and "_absmax" in node:
            g = "/".join(path[:depth])
            if g not in groups:
                groups.append(g)
            return
        for k, v in node.items():
            walk(v, path + (k,))

    walk(params, ())
    return tuple(groups)


def sensitivity_scan(apply_fn, calibrated_params: Dict, batch, depth: int = 2,
                     norm=None) -> list:
    """Per-group PTQ sensitivity — the skip-list recipe mirroring the
    reference's ppq calibration flow (/root/reference/deployment/ppq), which
    calibrates WITH accuracy checks and excludes layers that cost accuracy.

    For each conv group (quant_groups at ``depth``), quantize ONLY that group
    and measure the mean |delta| of ``apply_fn``'s flattened outputs vs the
    float baseline on ``batch``.  Returns [(group, delta)] sorted worst
    first.  Recipe: quantize everything, measure the end metric (AP); if it
    regresses, skip the top-ranked groups here via
    ``quantize_compute_params(skip=...)`` until the metric recovers.
    """
    import jax

    def flat(out):
        leaves = jax.tree_util.tree_leaves(out)
        return jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])

    baseline = flat(apply_fn(strip_calibration(calibrated_params), batch))
    results = []
    for g in quant_groups(calibrated_params, depth):
        only = quantize_compute_params(
            calibrated_params, predicate=lambda p, _s, g=g: p.startswith(g)
        )
        delta = flat(apply_fn(only, batch)) - baseline
        d = float(jnp.mean(jnp.abs(delta)))
        results.append((g, d if norm is None else d / norm))
    return sorted(results, key=lambda t: -t[1])


class CalibrationObserver:
    """Activation-range calibration (moving abs-max over batches) for
    exporting to int8-native runtimes."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.ranges: Dict[str, float] = {}

    def observe(self, name: str, x) -> None:
        amax = float(jnp.max(jnp.abs(x)))
        if name in self.ranges:
            self.ranges[name] = self.momentum * self.ranges[name] + (1 - self.momentum) * amax
        else:
            self.ranges[name] = amax

    def scales(self) -> Dict[str, float]:
        return {k: v / 127.0 for k, v in self.ranges.items()}
