"""YAML model DSL: assemble arbitrary YOLOv5-family architectures from the
ultralytics yaml config format.

Re-design of ``parse_model`` + ``DetectionModel``
(reference yolort/v5/models/yolo.py:278-341, :46) for the functional JAX
stack: a yaml dict parses into a flat list of :class:`LayerSpec` rows over
the existing block zoo (yolort_tpu.ops.blocks), executed as one pure
function over a params pytree keyed by the ultralytics flat layer index
("0".."N").  That keying makes checkpoint ingestion *generic*: any
ultralytics ``.pt`` whose yaml uses known modules converts by walking
``model.<i>`` — no hard-coded index tables (contrast
models/_checkpoint.py:254-261, which only covers the canonical P5/P6
layouts).

Strides are derived statically from the graph (stride-2 convs, Focus,
Contract/Expand, Upsample) rather than by a probe forward pass (the
reference runs a dummy tensor through the model, v5/models/yolo.py:115).
"""

from __future__ import annotations

import ast
import math
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.models.darknet import make_divisible
from yolort_tpu.models.head import YOLOHead, concat_pred_logits
from yolort_tpu.ops import blocks as B
from yolort_tpu.ops.blocks import Params
from yolort_tpu.ops.experimental import CrossConv, MixConv2d

__all__ = ["parse_model", "YAMLDetectionModel", "load_yaml_config"]


# blocks that take (c1, c2, ...) and scale c2 by width_multiple
_BLOCKS = {
    "Conv": B.Conv,
    "DWConv": B.DWConv,
    "GhostConv": B.GhostConv,
    "Bottleneck": B.Bottleneck,
    "GhostBottleneck": B.GhostBottleneck,
    "SPP": B.SPP,
    "SPPF": B.SPPF,
    "Focus": B.Focus,
    "BottleneckCSP": B.BottleneckCSP,
    "C3": B.C3,
    "C3TR": B.C3TR,
    "C3Ghost": B.C3Ghost,
    "CrossConv": CrossConv,
    "MixConv2d": MixConv2d,
}
# blocks whose repeat count n becomes their 3rd constructor arg
# (parse_model: "args.insert(2, n); n = 1")
_WITH_REPEATS = {"BottleneckCSP", "C3", "C3TR", "C3Ghost"}


def _eval_arg(a, ns: Dict[str, Any]):
    """Resolve a yaml arg: literals stay literal, known names (nc, anchors)
    resolve from ``ns``, anything else (e.g. 'nearest') stays a string.
    The reference uses bare eval() (yolo.py:288-292); this is the same
    contract without executing arbitrary expressions."""
    if not isinstance(a, str):
        return a
    try:
        return ast.literal_eval(a)
    except (ValueError, SyntaxError):
        return ns.get(a, a)


@dataclass(frozen=True)
class _Repeat:
    """n>1 repeats of a non-C3 block (parse_model wraps in nn.Sequential, so
    ultralytics param keys are '0'..'n-1' — mirrored here)."""

    blocks: Tuple[Any, ...]

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.blocks))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def __call__(self, p: Params, x):
        for i, b in enumerate(self.blocks):
            x = b(p[str(i)], x)
        return x


@dataclass(frozen=True)
class LayerSpec:
    """One parsed yaml row: [from, number, module, args]."""

    i: int
    f: Tuple[int, ...]           # absolute input indices; -1 = previous
    kind: str                    # 'block' | 'upsample' | 'concat' | 'contract'
    #                            | 'expand' | 'batchnorm' | 'maxpool' | 'detect'
    name: str                    # original module name from the yaml
    block: Any = None            # block instance for 'block'/'batchnorm'
    extra: Tuple = ()            # kind-specific static args


def _upsample(x, scale: int):
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def _maxpool(x, k: int, s: int, p: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )


def parse_model(
    d: Dict[str, Any], ch: Sequence[int] = (3,), act: str = "silu"
) -> Tuple[List[LayerSpec], List[int], Dict[str, Any]]:
    """yaml dict -> (layer specs, savelist, meta).

    Follows the reference parse_model line by line in *semantics*
    (v5/models/yolo.py:278-341): depth gain max(round(n*gd),1), width gain
    make_divisible(c2*gw, 8), repeats folded into C3-family ``n``.
    ``meta`` carries nc / anchor_grids / strides / detect inputs.
    """
    anchors, nc = d["anchors"], int(d["nc"])
    gd, gw = float(d["depth_multiple"]), float(d["width_multiple"])
    na = (len(anchors[0]) // 2) if isinstance(anchors, list) else int(anchors)
    no = na * (nc + 5)
    ns = {"nc": nc, "anchors": anchors, "None": None}

    ch = list(ch)
    scales: List[float] = [1.0]  # spatial downscale factor per entry of ch
    layers: List[LayerSpec] = []
    save: List[int] = []
    meta: Dict[str, Any] = {"nc": nc}

    for i, (f, n, m, args) in enumerate(list(d["backbone"]) + list(d["head"])):
        name = m if isinstance(m, str) else getattr(m, "__name__", str(m))
        args = [_eval_arg(a, ns) for a in args]
        n = max(round(n * gd), 1) if n > 1 else n
        f_t = tuple(f) if isinstance(f, (list, tuple)) else (f,)
        in_ch = ch[f_t[0]]
        in_scale = scales[f_t[0]]
        out_scale = in_scale

        if name in _BLOCKS:
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            bargs = [in_ch, c2, *args[1:]]
            cls = _BLOCKS[name]
            if name in _WITH_REPEATS:
                bargs.insert(2, n)
                n = 1
            kw = {}
            if name in ("Conv", "DWConv", "Bottleneck", "SPP", "SPPF", "Focus",
                        "C3", "C3TR", "C3Ghost", "GhostConv"):
                kw["act"] = act
            if n > 1:
                # reference repeats the module with IDENTICAL args
                # (yolo.py:332: nn.Sequential(*(m(*args) for _ in range(n))))
                block = _Repeat(tuple(cls(*bargs, **kw) for _ in range(n)))
            else:
                block = cls(*bargs, **kw)
            # stride bookkeeping
            s_attr = getattr(block, "s", 1) if n == 1 else getattr(block.blocks[0], "s", 1)
            out_scale = in_scale * (s_attr if isinstance(s_attr, int) else 1)
            if name == "Focus":
                out_scale *= 2  # space-to-depth halves H/W before the conv
            layers.append(LayerSpec(i, f_t, "block", name, block))
        elif name in ("nn.BatchNorm2d", "BatchNorm2d"):
            c2 = in_ch
            layers.append(LayerSpec(i, f_t, "batchnorm", name, B.BatchNorm(c2)))
        elif name == "Concat":
            c2 = sum(ch[x] for x in f_t)
            layers.append(LayerSpec(i, f_t, "concat", name))
        elif name in ("nn.Upsample", "Upsample"):
            scale = int(args[1]) if len(args) > 1 and args[1] else 2
            c2 = in_ch
            out_scale = in_scale / scale
            layers.append(LayerSpec(i, f_t, "upsample", name, extra=(scale,)))
        elif name == "Contract":
            g = int(args[0])
            c2 = in_ch * g * g
            out_scale = in_scale * g
            layers.append(LayerSpec(i, f_t, "contract", name, extra=(g,)))
        elif name == "Expand":
            g = int(args[0])
            c2 = in_ch // (g * g)
            out_scale = in_scale / g
            layers.append(LayerSpec(i, f_t, "expand", name, extra=(g,)))
        elif name in ("nn.MaxPool2d", "MaxPool2d"):
            k = int(args[0])
            s = int(args[1]) if len(args) > 1 else k
            p = int(args[2]) if len(args) > 2 else 0
            c2 = in_ch
            out_scale = in_scale * s
            layers.append(LayerSpec(i, f_t, "maxpool", name, extra=(k, s, p)))
        elif name == "Detect":
            det_nc = int(args[0])
            det_anchors = args[1]
            if isinstance(det_anchors, int):  # anchor count only
                det_anchors = [list(range(det_anchors * 2))] * len(f_t)
            strides = tuple(int(scales[x]) for x in f_t)
            in_channels = tuple(ch[x] for x in f_t)
            meta.update(
                nc=det_nc,
                anchor_grids=tuple(tuple(float(v) for v in a) for a in det_anchors),
                strides=strides,
                detect_from=f_t,
                detect_index=i,
                detect_in_channels=in_channels,
            )
            head = YOLOHead(in_channels, len(det_anchors[0]) // 2, strides, det_nc)
            layers.append(LayerSpec(i, f_t, "detect", name, head))
            c2 = ch[-1]
        else:
            raise ValueError(f"Unsupported yaml module '{name}' (layer {i})")

        save.extend(x % i for x in f_t if x != -1)
        if i == 0:
            ch, scales = [], []
        ch.append(c2)
        scales.append(out_scale)

    if "detect_from" not in meta:
        raise ValueError("yaml config has no Detect layer")
    return layers, sorted(set(save)), meta


def load_yaml_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as fh:
        return yaml.safe_load(fh)


_SIZE_MULTIPLES = {"n": (0.33, 0.25), "s": (0.33, 0.5), "m": (0.67, 0.75),
                   "l": (1.0, 1.0), "x": (1.33, 1.25)}

# canonical v6.0 row lists (data contract — reference v5/models/yolov5s.yaml
# and hub/yolov5s6.yaml; the n/s/m/l/x variants differ only in multiples)
_P5_BACKBONE = [
    [-1, 1, "Conv", [64, 6, 2, 2]],
    [-1, 1, "Conv", [128, 3, 2]],
    [-1, 3, "C3", [128]],
    [-1, 1, "Conv", [256, 3, 2]],
    [-1, 6, "C3", [256]],
    [-1, 1, "Conv", [512, 3, 2]],
    [-1, 9, "C3", [512]],
    [-1, 1, "Conv", [1024, 3, 2]],
    [-1, 3, "C3", [1024]],
    [-1, 1, "SPPF", [1024, 5]],
]
_P5_HEAD = [
    [-1, 1, "Conv", [512, 1, 1]],
    [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
    [[-1, 6], 1, "Concat", [1]],
    [-1, 3, "C3", [512, False]],
    [-1, 1, "Conv", [256, 1, 1]],
    [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
    [[-1, 4], 1, "Concat", [1]],
    [-1, 3, "C3", [256, False]],
    [-1, 1, "Conv", [256, 3, 2]],
    [[-1, 14], 1, "Concat", [1]],
    [-1, 3, "C3", [512, False]],
    [-1, 1, "Conv", [512, 3, 2]],
    [[-1, 10], 1, "Concat", [1]],
    [-1, 3, "C3", [1024, False]],
    [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
]
_P5_ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
               [116, 90, 156, 198, 373, 326]]

_P6_BACKBONE = [
    [-1, 1, "Conv", [64, 6, 2, 2]],
    [-1, 1, "Conv", [128, 3, 2]],
    [-1, 3, "C3", [128]],
    [-1, 1, "Conv", [256, 3, 2]],
    [-1, 6, "C3", [256]],
    [-1, 1, "Conv", [512, 3, 2]],
    [-1, 9, "C3", [512]],
    [-1, 1, "Conv", [768, 3, 2]],
    [-1, 3, "C3", [768]],
    [-1, 1, "Conv", [1024, 3, 2]],
    [-1, 3, "C3", [1024]],
    [-1, 1, "SPPF", [1024, 5]],
]
_P6_HEAD = [
    [-1, 1, "Conv", [768, 1, 1]],
    [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
    [[-1, 8], 1, "Concat", [1]],
    [-1, 3, "C3", [768, False]],
    [-1, 1, "Conv", [512, 1, 1]],
    [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
    [[-1, 6], 1, "Concat", [1]],
    [-1, 3, "C3", [512, False]],
    [-1, 1, "Conv", [256, 1, 1]],
    [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
    [[-1, 4], 1, "Concat", [1]],
    [-1, 3, "C3", [256, False]],
    [-1, 1, "Conv", [256, 3, 2]],
    [[-1, 20], 1, "Concat", [1]],
    [-1, 3, "C3", [512, False]],
    [-1, 1, "Conv", [512, 3, 2]],
    [[-1, 16], 1, "Concat", [1]],
    [-1, 3, "C3", [768, False]],
    [-1, 1, "Conv", [768, 3, 2]],
    [[-1, 12], 1, "Concat", [1]],
    [-1, 3, "C3", [1024, False]],
    [[23, 26, 29, 32], 1, "Detect", ["nc", "anchors"]],
]
_P6_ANCHORS = [[19, 27, 44, 40, 38, 94], [96, 68, 86, 152, 180, 137],
               [140, 301, 303, 264, 238, 542], [436, 615, 739, 380, 925, 792]]


def build_yaml_config(size: str = "s", p6: bool = False, num_classes: int = 80) -> Dict[str, Any]:
    """The canonical yolov5{n,s,m,l,x}(6) config dict, as the reference's
    yaml files express it (v5/models/*.yaml + hub/*6.yaml)."""
    dm, wm = _SIZE_MULTIPLES[size]
    import copy

    return {
        "nc": num_classes,
        "depth_multiple": dm,
        "width_multiple": wm,
        "anchors": copy.deepcopy(_P6_ANCHORS if p6 else _P5_ANCHORS),
        "backbone": copy.deepcopy(_P6_BACKBONE if p6 else _P5_BACKBONE),
        "head": copy.deepcopy(_P6_HEAD if p6 else _P5_HEAD),
    }


@dataclass(frozen=True)
class YAMLDetectionModel:
    """A detection model assembled from a yaml config dict.

    Public surface matches :class:`yolort_tpu.models.yolo.YOLO`
    (init / head_outputs / decode / __call__), so the wrapper, AOT export,
    and postprocess config all compose unchanged."""

    cfg: Dict[str, Any]
    act: str = "silu"
    # post-process config (reference yolo.py:77-79 defaults)
    score_thresh: float = 0.005
    nms_thresh: float = 0.45
    detections_per_img: int = 300
    pre_nms_topk: int = 4096
    pre_nms_anchors: Optional[int] = None
    nms_tile_size: int = 256
    nms_impl: str = "auto"
    classes_per_anchor: Optional[int] = None
    # overrides (e.g. anchors recomputed from a checkpoint's Detect buffers)
    anchor_grids_override: Optional[Tuple[Tuple[float, ...], ...]] = None

    def __post_init__(self):
        layers, save, meta = parse_model(self.cfg, act=self.act)
        if self.anchor_grids_override is not None:
            ag = tuple(tuple(a) for a in self.anchor_grids_override)
            meta = dict(meta, anchor_grids=ag)
            det = layers[-1]
            head = replace(det.block, num_anchors=len(ag[0]) // 2)
            layers = layers[:-1] + [replace(det, block=head)]
        object.__setattr__(self, "layers", tuple(layers))
        object.__setattr__(self, "save", frozenset(save))
        object.__setattr__(self, "meta", meta)

    # -- YOLO-compatible properties ------------------------------------
    @property
    def num_classes(self) -> int:
        return self.meta["nc"]

    @property
    def strides(self) -> Tuple[int, ...]:
        return self.meta["strides"]

    @property
    def anchor_grids(self) -> Tuple[Tuple[float, ...], ...]:
        return self.meta["anchor_grids"]

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_grids[0]) // 2

    # -------------------------------------------------------------------
    def init(self, key) -> Params:
        params: Dict[str, Params] = {}
        specs = [s for s in self.layers if s.block is not None]
        keys = jax.random.split(key, max(len(specs), 1))
        for spec, k in zip(specs, keys):
            params[str(spec.i)] = spec.block.init(k)
        return params

    def head_outputs(self, params: Params, images: jax.Array) -> List[jax.Array]:
        """images (B,H,W,3) -> per-level raw logits (B,Hl,Wl,A*(5+nc))."""
        saved: Dict[int, jax.Array] = {}
        x = images
        for spec in self.layers:
            ins = [x if j == -1 else saved[j] for j in spec.f]
            if spec.kind == "block":
                x = spec.block(params[str(spec.i)], ins[0])
            elif spec.kind == "batchnorm":
                x = spec.block(params[str(spec.i)], ins[0])
            elif spec.kind == "concat":
                x = jnp.concatenate(ins, axis=-1)  # NHWC channel concat
            elif spec.kind == "upsample":
                x = _upsample(ins[0], spec.extra[0])
            elif spec.kind == "contract":
                x = B.contract(ins[0], spec.extra[0])
            elif spec.kind == "expand":
                x = B.expand(ins[0], spec.extra[0])
            elif spec.kind == "maxpool":
                x = _maxpool(ins[0], *spec.extra)
            elif spec.kind == "detect":
                return spec.block(params[str(spec.i)], ins)
            if spec.i in self.save:
                saved[spec.i] = x
        raise AssertionError("unreachable: Detect layer guaranteed by parse_model")

    def decode(self, params: Params, images: jax.Array) -> jax.Array:
        outs = self.head_outputs(params, images)
        grid_sizes = [o.shape[1:3] for o in outs]
        return concat_pred_logits(outs, grid_sizes, self.strides, self.anchor_grids)

    def __call__(self, params: Params, images: jax.Array):
        from yolort_tpu.ops.nms import batched_postprocess_from_heads

        outs = self.head_outputs(params, images)
        return batched_postprocess_from_heads(
            outs,
            self.strides,
            self.anchor_grids,
            num_classes=self.num_classes,
            score_thresh=self.score_thresh,
            nms_thresh=self.nms_thresh,
            detections_per_img=self.detections_per_img,
            pre_nms_topk=self.pre_nms_topk,
            pre_nms_anchors=self.pre_nms_anchors,
            nms_tile_size=self.nms_tile_size,
            nms_impl=self.nms_impl,
            classes_per_anchor=self.classes_per_anchor,
        )


def load_yaml_from_ultralytics(
    checkpoint_path: str, fuse: bool = True, act: str = "silu", **model_kwargs
) -> Tuple[YAMLDetectionModel, Params]:
    """Generic ultralytics ``.pt`` ingestion via the yaml DSL.

    Works for ANY architecture whose yaml (stored on the pickled model)
    uses known modules — including custom layouts the fixed index maps in
    models/_checkpoint.py cannot express.  Anchors are taken from the
    Detect buffers (auto-anchor may have changed them, reference
    _checkpoint.py:36-44); params are keyed by flat layer index, matching
    the ultralytics ``model.<i>.*`` naming directly.
    """
    import numpy as np

    from yolort_tpu.models._checkpoint import (
        _buffers_of,
        _children,
        _np,
        _seq_children,
        _to_jnp,
        convert_module,
        load_torch_checkpoint,
    )

    ckpt = load_torch_checkpoint(checkpoint_path)
    model = (ckpt.get("ema") or ckpt["model"]) if isinstance(ckpt, dict) else ckpt
    yaml_cfg = object.__getattribute__(model, "__dict__").get("yaml")
    if not yaml_cfg or "backbone" not in yaml_cfg or "head" not in yaml_cfg:
        raise ValueError(
            f"checkpoint {checkpoint_path} carries no full yaml config "
            "(backbone/head rows required for generic ingestion)"
        )

    flat = _seq_children(_children(model)["model"])
    detect = flat[-1]
    det_buf = _buffers_of(detect)
    anchors = _np(det_buf["anchors"])  # (nl, na, 2) in stride units
    stride_t = det_buf.get("stride")
    if stride_t is None:
        stride_t = object.__getattribute__(detect, "__dict__").get("stride")
    if stride_t is None:
        stride_t = object.__getattribute__(model, "__dict__").get("stride")
    strides = np.asarray(_np(stride_t)).reshape(-1)
    anchor_grids = tuple(
        tuple(float(v) for v in (a * s).reshape(-1))
        for a, s in zip(anchors, strides)
    )

    m = YAMLDetectionModel(
        yaml_cfg, act=act, anchor_grids_override=anchor_grids, **model_kwargs
    )
    params: Dict[str, Any] = {}
    for spec in m.layers:
        if spec.block is None:
            continue
        converted = convert_module(flat[spec.i], fuse=fuse)
        if spec.kind == "detect":
            converted = converted["m"]  # Detect stores its convs under .m
        params[str(spec.i)] = converted
    return m, _to_jnp(params)
