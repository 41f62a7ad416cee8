"""Checkpoint ingestion: ultralytics/yolov5 ``.pt`` -> yolort_tpu params.

Re-design of ``yolort/models/_checkpoint.py:16`` (load_from_ultralytics) and
the pickled-model loader ``yolort/v5/helper.py:49``.  Key differences:

  * No ultralytics module tree is required: the pickle is loaded with a
    *stub unpickler* that materializes unknown classes as plain state
    holders, then the nn.Module hierarchy is walked generically through its
    ``_modules``/``_parameters``/``_buffers`` dicts.  (The reference instead
    injects a sys.path shim so the real classes import, v5/helper.py:15-29.)
  * Weights are converted OIHW -> HWIO and BatchNorm is folded into the conv
    at ingestion (eval-mode affine; the fp16 cast the reference does at
    _checkpoint.py:81 is replaced by an optional bf16 cast on device).
  * The flat ``model.N`` indices map onto the structured pytree with the
    same index tables the reference uses (_checkpoint.py:54-64).

torch (CPU) is only needed at conversion time; converted checkpoints are
saved/loaded as .npz (see ``save_params``/``load_params``) and never touch
torch again.
"""

from __future__ import annotations

import io
import json
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from yolort_tpu.ops.blocks import fuse_conv_bn

__all__ = [
    "load_from_ultralytics",
    "convert_yolov5_checkpoint",
    "save_params",
    "load_params",
    "load_pretrained_params",
    "get_yolov5_size",
]


# ---------------------------------------------------------------------------
# stub unpickling of ultralytics checkpoints
# ---------------------------------------------------------------------------

class _Stub:
    """Materializes any unimportable pickled class as a plain state holder."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __getattr__(self, name):
        d = object.__getattribute__(self, "__dict__")
        for container in ("_modules", "_parameters", "_buffers"):
            sub = d.get(container)
            if sub is not None and name in sub:
                return sub[name]
        raise AttributeError(name)


_STUB_CACHE: Dict[Tuple[str, str], type] = {}


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(name, (_Stub,), {"__module__": module})
    return _STUB_CACHE[key]


def _make_pickle_module():
    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            # torch internals must resolve for real so tensors rebuild;
            # anything else (ultralytics 'models.*', 'utils.*', numpy
            # scalars from old versions, ...) may fall back to a stub.
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return _stub_class(module, name)

    class _Mod:
        Unpickler = StubUnpickler
        loads = staticmethod(pickle.loads)

        @staticmethod
        def load(f, **kw):
            return StubUnpickler(f).load()

    return _Mod


def load_torch_checkpoint(path: str) -> Any:
    """torch.load with stub classes for the ultralytics module tree."""
    import torch

    return torch.load(
        path, map_location="cpu", pickle_module=_make_pickle_module(), weights_only=False
    )


# ---------------------------------------------------------------------------
# generic nn.Module-tree walking (works on real modules and stubs alike)
# ---------------------------------------------------------------------------

def _dict_of(m, key):
    return object.__getattribute__(m, "__dict__").get(key) or {}


def _children(m) -> Dict[str, Any]:
    return dict(_dict_of(m, "_modules"))


def _params_of(m) -> Dict[str, Any]:
    return {k: v for k, v in _dict_of(m, "_parameters").items() if v is not None}


def _buffers_of(m) -> Dict[str, Any]:
    return {k: v for k, v in _dict_of(m, "_buffers").items() if v is not None}


def _np(t) -> np.ndarray:
    arr = t.detach().cpu().float().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.ascontiguousarray(arr.astype(np.float32))


def _cls_name(m) -> str:
    return type(m).__name__


def _seq_children(m) -> List[Any]:
    """Ordered children of a Sequential/ModuleList(-stub)."""
    items = sorted(_children(m).items(), key=lambda kv: int(kv[0]))
    return [v for _, v in items]


# ---------------------------------------------------------------------------
# leaf converters (torch layouts -> ours)
# ---------------------------------------------------------------------------

def _convert_conv2d(m) -> Dict[str, np.ndarray]:
    p = _params_of(m)
    out = {"w": _np(p["weight"]).transpose(2, 3, 1, 0)}  # OIHW -> HWIO
    if "bias" in p:
        out["b"] = _np(p["bias"])
    return out


def _convert_conv_bn(m, fuse: bool = True) -> Dict[str, np.ndarray]:
    """Ultralytics Conv = conv(Conv2d, no bias) + bn + act."""
    ch = _children(m)
    w = _np(_params_of(ch["conv"])["weight"]).transpose(2, 3, 1, 0)
    bnp = _params_of(ch["bn"])
    bnb = _buffers_of(ch["bn"])
    gamma, beta = _np(bnp["weight"]), _np(bnp["bias"])
    mean, var = _np(bnb["running_mean"]), _np(bnb["running_var"])
    eps = float(object.__getattribute__(ch["bn"], "__dict__").get("eps", 1e-3))
    if fuse:
        w_f, b_f = fuse_conv_bn(w, gamma, beta, mean, var, eps=eps)
        return {"w": w_f, "b": b_f}
    return {"w": w, "gamma": gamma, "beta": beta, "mean": mean, "var": var}


def _convert_batchnorm(m) -> Dict[str, np.ndarray]:
    p, b = _params_of(m), _buffers_of(m)
    return {
        "gamma": _np(p["weight"]),
        "beta": _np(p["bias"]),
        "mean": _np(b["running_mean"]),
        "var": _np(b["running_var"]),
    }


def _convert_linear(m) -> Dict[str, np.ndarray]:
    p = _params_of(m)
    out = {"w": _np(p["weight"]).T}  # (out,in) -> (in,out)
    if "bias" in p:
        out["b"] = _np(p["bias"])
    return out


def _convert_mha(m) -> Dict[str, np.ndarray]:
    """torch.nn.MultiheadAttention -> {'in_proj_w','in_proj_b','out_proj'}."""
    p = _params_of(m)
    ch = _children(m)
    out_proj = ch.get("out_proj")
    out = {
        "in_proj_w": _np(p["in_proj_weight"]),
        "in_proj_b": _np(p["in_proj_bias"]),
        "out_proj": _convert_linear(out_proj),
    }
    return out


_PARAMFREE = {
    "SiLU", "Hardswish", "LeakyReLU", "Identity", "Upsample", "MaxPool2d",
    "Concat", "Dropout", "ReLU", "ReLU6",
}


def convert_module(m, fuse: bool = True) -> Optional[Dict[str, Any]]:
    """Recursively convert any (stub) module subtree into our params pytree.

    Child names in ultralytics blocks (cv1/cv2/m/0/1/...) match our block
    param keys by construction, so the walk is fully generic."""
    name = _cls_name(m)
    ch = _children(m)
    if name == "Conv2d":
        return _convert_conv2d(m)
    if name == "BatchNorm2d":
        return _convert_batchnorm(m)
    if name == "Linear":
        return _convert_linear(m)
    if name == "MultiheadAttention":
        return _convert_mha(m)
    if name in _PARAMFREE and not ch:
        return None
    if "conv" in ch and "bn" in ch and _cls_name(ch["conv"]) == "Conv2d":
        # an ultralytics Conv block (conv+bn+act)
        return _convert_conv_bn(m, fuse=fuse)

    out: Dict[str, Any] = {}
    for k, sub in ch.items():
        if _cls_name(sub) == "MultiheadAttention" and k == "ma":
            # flatten attention into the parent (our TransformerLayer layout)
            mha = _convert_mha(sub)
            out.update(mha)
            continue
        converted = convert_module(sub, fuse=fuse)
        if converted is not None:
            out[k] = converted
    # direct parameters/buffers at this level (e.g. Detect.anchors handled
    # separately; Linear-in-stub etc.)
    for k, v in _params_of(m).items():
        out.setdefault(k, _np(v))
    if not out:
        return None
    return out


# ---------------------------------------------------------------------------
# flat-index -> structured pytree mapping (reference _checkpoint.py:49-64)
# ---------------------------------------------------------------------------

P5_INNER_MAP = {"0": 9, "1": 10, "3": 13, "4": 14}
P5_LAYER_MAP = {"0": 17, "1": 18, "2": 20, "3": 21, "4": 23}
P5_HEAD_IND = 24

P6_P6_MAP = {"0": 9, "1": 10}
P6_INNER_MAP = {"0": 11, "1": 12, "3": 15, "4": 16, "6": 19, "7": 20}
P6_LAYER_MAP = {"0": 23, "1": 24, "2": 26, "3": 27, "4": 29, "5": 30, "6": 32}
P6_HEAD_IND = 33


def get_yolov5_size(depth_multiple: float, width_multiple: float) -> str:
    """(reference v5/helper.py:32)"""
    table = {
        (0.33, 0.25): "n",
        (0.33, 0.5): "s",
        (0.67, 0.75): "m",
        (1.0, 1.0): "l",
        (1.33, 1.25): "x",
    }
    key = (round(depth_multiple, 2), round(width_multiple, 2))
    if key not in table:
        raise NotImplementedError(
            f"Unsupported depth/width multiples ({depth_multiple}, {width_multiple})"
        )
    return table[key]


def load_from_ultralytics(checkpoint_path: str, version: str = "r6.0", fuse: bool = True) -> Dict:
    """Parse an ultralytics .pt checkpoint into a yolort_tpu params pytree +
    architecture metadata (reference _checkpoint.py:16-94)."""
    if version not in ("r3.1", "r4.0", "r6.0"):
        raise NotImplementedError(f"Unsupported version {version}")

    ckpt = load_torch_checkpoint(checkpoint_path)
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") or ckpt["model"]  # EMA preferred (v5/helper.py:69)
    else:
        model = ckpt

    yaml_cfg = object.__getattribute__(model, "__dict__").get("yaml", {})
    num_classes = int(yaml_cfg["nc"])
    depth_multiple = float(yaml_cfg["depth_multiple"])
    width_multiple = float(yaml_cfg["width_multiple"])

    flat = _seq_children(_children(model)["model"])
    detect = flat[-1]
    det_buf = _buffers_of(detect)
    # 'stride' may live as a Detect buffer, a Detect attr, or a model attr
    # depending on the ultralytics version
    stride_t = None
    for candidate in (
        det_buf.get("stride"),
        object.__getattribute__(detect, "__dict__").get("stride"),
        object.__getattribute__(model, "__dict__").get("stride"),
    ):
        if candidate is not None:
            stride_t = candidate
            break
    strides = [int(s) for s in _np(stride_t).reshape(-1).tolist()]
    use_p6 = len(strides) == 4

    # anchors recomputed from the Detect buffers, not the yaml — auto-anchor
    # may have changed them (reference _checkpoint.py:36-44)
    anchors = _np(det_buf["anchors"])  # (nl, na, 2), normalized by stride
    anchor_grids = (anchors * np.asarray(strides, np.float32)[:, None, None]).reshape(
        len(strides), -1
    ).tolist()

    inner_map, layer_map, p6_map, head_ind = (
        (P6_INNER_MAP, P6_LAYER_MAP, P6_P6_MAP, P6_HEAD_IND)
        if use_p6
        else (P5_INNER_MAP, P5_LAYER_MAP, None, P5_HEAD_IND)
    )

    backbone = {str(i): convert_module(flat[i], fuse=fuse) for i in range(9)}
    pan: Dict[str, Any] = {
        "inner": {k: convert_module(flat[i], fuse=fuse) for k, i in inner_map.items()},
        "layer": {k: convert_module(flat[i], fuse=fuse) for k, i in layer_map.items()},
    }
    if p6_map is not None:
        pan["p6"] = {k: convert_module(flat[i], fuse=fuse) for k, i in p6_map.items()}

    head_convs = _seq_children(_children(detect)["m"])
    head = {str(i): _convert_conv2d(c) for i, c in enumerate(head_convs)}

    params = _to_jnp({"backbone": backbone, "pan": pan, "head": head})

    return {
        "num_classes": num_classes,
        "depth_multiple": depth_multiple,
        "width_multiple": width_multiple,
        "strides": strides,
        "anchor_grids": anchor_grids,
        "use_p6": use_p6,
        "size": get_yolov5_size(depth_multiple, width_multiple),
        "params": params,
    }


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


# ---------------------------------------------------------------------------
# native checkpoint format (.npz + json meta) — replaces torch.save and the
# torch.hub URL cache (reference yolo.py:262, general.py:623 strip_optimizer)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(path: str, params, meta: Optional[Dict] = None) -> None:
    flat = _flatten(params)
    flat["__meta__"] = np.frombuffer(json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_params(path: str) -> Tuple[Dict, Dict]:
    data = np.load(path, allow_pickle=False)
    meta = {}
    flat = {}
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k]).decode())
        else:
            flat[k] = data[k]
    return _unflatten(flat), meta


def convert_yolov5_checkpoint(
    checkpoint_path: str,
    output_path: str,
    version: str = "r6.0",
    prefix: str = "yolov5_darknet_pan",
    postfix: str = "custom.npz",
) -> str:
    """CLI-facing converter (reference _checkpoint.py:97-122)."""
    info = load_from_ultralytics(checkpoint_path, version=version)
    size = info["size"]
    p6 = "6" if info["use_p6"] else ""
    name = f"{prefix}_{size}{p6}_{version.replace('.', '')}_{postfix}"
    out = str(Path(output_path) / name)
    meta = {k: info[k] for k in (
        "num_classes", "depth_multiple", "width_multiple", "strides",
        "anchor_grids", "use_p6", "size",
    )}
    save_params(out, info["params"], meta)
    return out


def load_pretrained_params(arch: str, model) -> Dict:
    """Resolve pretrained weights from the local weights directory
    (YOLORT_TPU_WEIGHTS or ~/.cache/yolort_tpu), then — if a hub is
    configured via YOLORT_HUB_BASE — by downloading the sha-suffixed
    release asset (the reference's registry flow, yolo.py:271-289, with
    retry/resume/sha semantics from v5/utils/downloads.py:24-47).
    Downloads are opt-in: with no hub configured, weights must be
    pre-seeded (the zero-egress default)."""
    import os

    from yolort_tpu.utils.robustness import PRETRAINED_REGISTRY, verify_checkpoint

    roots = [
        os.environ.get("YOLORT_TPU_WEIGHTS", ""),
        os.path.expanduser("~/.cache/yolort_tpu"),
    ]
    names = [f"{arch}_coco"]
    if arch in PRETRAINED_REGISTRY:
        names.append(PRETRAINED_REGISTRY[arch])  # sha-suffixed release name
    for root in roots:
        if not root:
            continue
        for name in names:
            cand = Path(root) / f"{name}.npz"
            if cand.exists():
                if not verify_checkpoint(str(cand)):
                    raise ValueError(f"sha256 mismatch for checkpoint {cand}")
                params, _ = load_params(str(cand))
                return params
            cand_pt = Path(root) / f"{name}.pt"
            if cand_pt.exists():
                if not verify_checkpoint(str(cand_pt)):
                    raise ValueError(f"sha256 mismatch for checkpoint {cand_pt}")
                return load_from_ultralytics(str(cand_pt))["params"]

    from yolort_tpu.utils.robustness import attempt_download, hub_base

    base = hub_base()
    if base is not None and arch in PRETRAINED_REGISTRY:
        cache = Path(
            os.environ.get("YOLORT_TPU_WEIGHTS", "")
            or os.path.expanduser("~/.cache/yolort_tpu")
        )
        # Only the registry-named release asset is ever downloaded: its
        # filename embeds the sha256 prefix of the .pt payload, which is
        # passed EXPLICITLY so verification cannot be skipped.  There is
        # deliberately no fallthrough to a plain-name (unverifiable) asset
        # — a mirror that cannot serve the registry name gets a hard error,
        # never an unverified pickle into load_from_ultralytics (torch.load
        # executes code).  A sha256 mismatch (ValueError) is a tamper
        # signal and propagates instead of being swallowed (ADVICE r4).
        # The .npz variant is not attempted either: the registry hash is of
        # the reference's .pt asset, so an .npz could never verify.
        name = PRETRAINED_REGISTRY[arch]
        hash_prefix = name.rsplit("-", 1)[-1]
        got = attempt_download(
            f"{base}/{name}.pt", cache / f"{name}.pt", hash_prefix=hash_prefix
        )
        return load_from_ultralytics(str(got))["params"]

    raise FileNotFoundError(
        f"No pretrained weights for '{arch}'. Place '{arch}_coco.npz' under "
        "$YOLORT_TPU_WEIGHTS or ~/.cache/yolort_tpu, or set YOLORT_HUB_BASE "
        "to a release mirror to download them."
    )
