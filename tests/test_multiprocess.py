"""Multi-process eval-shard merge: the all_gather_objects multi-process
branch (parallel/distributed.py) executed for real across 2 jax.distributed
CPU processes, with the merged COCO evaluation pinned against the
single-process result (reference data/distributed.py:6-49 +
coco_eval.py:220-243 semantics)."""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, os.environ["YOLORT_REPO"])

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["RANK"]),
    )
    assert jax.process_count() == 2

    import numpy as np
    from yolort_tpu.data.coco_eval import COCOEvaluator
    from yolort_tpu.parallel.distributed import all_gather_objects, all_reduce_mean

    rank = jax.process_index()

    # deterministic shard content (same generator the parent uses)
    def make_shard(r):
        rng = np.random.default_rng(42 + r)
        preds, tgts = [], []
        for _ in range(6):
            ng = int(rng.integers(1, 5))
            gb = rng.uniform(0, 400, (ng, 2))
            gboxes = np.concatenate([gb, gb + rng.uniform(20, 120, (ng, 2))], 1).astype(np.float32)
            glabels = rng.integers(0, 5, ng)
            nd = int(rng.integers(1, 8))
            j = rng.integers(0, ng, nd)
            dboxes = (gboxes[j] + rng.normal(0, 5, (nd, 4))).astype(np.float32)
            preds.append({"boxes": dboxes, "scores": rng.random(nd).astype(np.float32),
                          "labels": glabels[j]})
            tgts.append({"boxes": gboxes, "labels": glabels})
        return preds, tgts

    ev = COCOEvaluator()
    preds, tgts = make_shard(rank)
    ev.update(preds, tgts)
    ev.synchronize_between_processes()  # exercises the multi-process branch
    result = ev.compute()

    mean = all_reduce_mean(float(rank))  # 0.5 across ranks
    if rank == 0:
        out = {"metrics": {k: float(v) for k, v in result.items()}, "mean": mean,
               "world": jax.process_count()}
        with open(os.environ["OUT"], "w") as f:
            json.dump(out, f)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_eval_merge(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    out_file = tmp_path / "result.json"
    coord = f"127.0.0.1:{_free_port()}"

    procs = []
    for rank in range(2):
        env = dict(os.environ, COORD=coord, RANK=str(rank), OUT=str(out_file),
                   YOLORT_REPO=str(REPO), JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # single CPU device per process
        procs.append(subprocess.Popen([sys.executable, str(worker_py)], env=env,
                                      stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]
    assert out_file.exists(), outs[0].decode()[-2000:]
    got = json.loads(out_file.read_text())
    assert got["world"] == 2
    assert got["mean"] == 0.5

    # single-process reference over the union of both shards
    from yolort_tpu.data.coco_eval import COCOEvaluator

    def make_shard(r):
        rng = np.random.default_rng(42 + r)
        preds, tgts = [], []
        for _ in range(6):
            ng = int(rng.integers(1, 5))
            gb = rng.uniform(0, 400, (ng, 2))
            gboxes = np.concatenate([gb, gb + rng.uniform(20, 120, (ng, 2))], 1).astype(np.float32)
            glabels = rng.integers(0, 5, ng)
            nd = int(rng.integers(1, 8))
            j = rng.integers(0, ng, nd)
            dboxes = (gboxes[j] + rng.normal(0, 5, (nd, 4))).astype(np.float32)
            preds.append({"boxes": dboxes, "scores": rng.random(nd).astype(np.float32),
                          "labels": glabels[j]})
            tgts.append({"boxes": gboxes, "labels": glabels})
        return preds, tgts

    ref = COCOEvaluator()
    for r in range(2):
        p, t = make_shard(r)
        ref.update(p, t)
    expect = ref.compute()
    for key, val in expect.items():
        assert got["metrics"][key] == pytest.approx(float(val), abs=1e-9), key
