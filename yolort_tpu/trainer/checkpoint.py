"""Training-state checkpointing and optimizer stripping.

Capability parity with the reference's checkpoint/resume surface
(SURVEY.md §5): ``strip_optimizer`` (v5/utils/general.py:623) becomes
``strip_optimizer`` over our npz train-state files; full save/resume of
TrainState (params + optimizer state + step) goes beyond the reference
(which delegates resume to Lightning)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolort_tpu.models._checkpoint import _flatten, _unflatten, load_params, save_params
from yolort_tpu.trainer.task import TrainState


def save_train_state(path: str, state: TrainState, meta: Optional[dict] = None) -> None:
    """Persist the full TrainState (params + opt_state + step) to one npz."""
    import json

    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(jax.device_get(state.params)).items()})
    opt_leaves = jax.tree_util.tree_leaves(jax.device_get(state.opt_state))
    for i, leaf in enumerate(opt_leaves):
        flat[f"opt/{i}"] = np.asarray(leaf)
    flat["step"] = np.asarray(int(state.step))
    flat["__meta__"] = np.frombuffer(json.dumps(meta or {}).encode(), np.uint8)
    np.savez(path, **flat)


def load_train_state(path: str, task) -> Tuple[TrainState, dict]:
    """Restore a TrainState saved by save_train_state.  ``task`` provides
    the optimizer treedef (opt state layout must match)."""
    import json

    data = np.load(path, allow_pickle=False)
    meta = {}
    params_flat = {}
    opt_leaves = {}
    step = 0
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k]).decode())
        elif k.startswith("params/"):
            params_flat[k[len("params/"):]] = data[k]
        elif k.startswith("opt/"):
            opt_leaves[int(k[len("opt/"):])] = data[k]
        elif k == "step":
            step = int(data[k])
    params = _unflatten(params_flat)
    template = task.tx.init(params)
    leaves = [jnp.asarray(opt_leaves[i]) for i in range(len(opt_leaves))]
    treedef = jax.tree_util.tree_structure(template)
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return TrainState(params, opt_state, jnp.asarray(step, jnp.int32)), meta


def strip_optimizer(ckpt_path: str, out_path: Optional[str] = None) -> str:
    """Reduce a train-state checkpoint to deployable params-only form
    (reference strip_optimizer, general.py:623)."""
    import json

    data = np.load(ckpt_path, allow_pickle=False)
    params_flat = {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")}
    meta = {}
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    meta["stripped"] = True
    out = out_path or ckpt_path
    save_params(out, _unflatten(params_flat), meta)
    return out
