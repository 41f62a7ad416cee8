"""Tests for breadth components: yolo_lite, VOC dataset, transforms,
EMA/early-stopping/one-cycle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_yolo_lite_shapes():
    from yolort_tpu.models.yolo_lite import yolov5_mobilenet_v3_small_fpn

    m = yolov5_mobilenet_v3_small_fpn(num_classes=5, pre_nms_topk=128, nms_tile_size=64)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    outs = m.head_outputs(p, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]  # strides 8..64
    det = m(p, x)
    assert det.boxes.shape == (1, 300, 4)


def test_voc_dataset(tmp_path):
    import cv2

    from yolort_tpu.data.voc import VOCDetection

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    cv2.imwrite(str(tmp_path / "JPEGImages" / "0001.jpg"), np.zeros((100, 120, 3), np.uint8))
    (tmp_path / "Annotations" / "0001.xml").write_text(
        """<annotation><size><width>120</width><height>100</height><depth>3</depth></size>
        <object><name>dog</name><difficult>0</difficult>
          <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>61</xmax><ymax>81</ymax></bndbox></object>
        <object><name>person</name><difficult>1</difficult>
          <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox></object>
        </annotation>"""
    )
    ds = VOCDetection(str(tmp_path))
    assert len(ds) == 1
    img, tgt = ds[0]
    assert img.shape == (100, 120, 3)
    np.testing.assert_allclose(tgt["boxes"], [[10, 20, 60, 80]])
    assert tgt["labels"][0] == 11  # 'dog'
    # difficult object dropped by default, kept with keep_difficult
    assert len(VOCDetection(str(tmp_path), keep_difficult=True)._parse_annotation("0001")["labels"]) == 2


def test_transforms_flip_and_scale():
    from yolort_tpu.data.transforms import RandomHorizontalFlip, RandomScaleTranslate, RandomHSV

    img = np.random.default_rng(0).uniform(0, 1, (60, 80, 3)).astype(np.float32)
    tgt = {"boxes": np.asarray([[10.0, 10.0, 30.0, 30.0]]), "labels": np.asarray([1])}
    f = RandomHorizontalFlip(p=1.0, seed=0)
    img2, tgt2 = f(img, tgt)
    np.testing.assert_allclose(tgt2["boxes"], [[50, 10, 70, 30]])
    np.testing.assert_allclose(img2[:, ::-1], img)

    st = RandomScaleTranslate(seed=0)
    img3, tgt3 = st(img, tgt)
    assert img3.shape == img.shape
    assert (tgt3["boxes"] >= 0).all()

    hsv = RandomHSV(seed=0)
    img4, _ = hsv(img, tgt)
    assert img4.shape == img.shape and img4.dtype == np.float32


def test_mixup():
    from yolort_tpu.data.transforms import Mixup

    img = np.ones((20, 20, 3), np.float32)
    a = (img * 0.2, {"boxes": np.asarray([[1.0, 1, 5, 5]]), "labels": np.asarray([0])})
    b = (img * 0.8, {"boxes": np.asarray([[2.0, 2, 6, 6]]), "labels": np.asarray([1])})
    img_m, tgt_m = Mixup(seed=0)(a, b)
    assert 0.2 <= img_m.mean() <= 0.8
    assert len(tgt_m["boxes"]) == 2


def test_model_ema_converges():
    from yolort_tpu.trainer.utils import ModelEMA

    ema = ModelEMA(decay=0.5, tau=1.0)
    p = {"w": jnp.zeros(3)}
    for _ in range(50):
        ema.update({"w": jnp.ones(3)})
    assert float(ema.params["w"][0]) > 0.95


def test_early_stopping():
    from yolort_tpu.trainer.utils import EarlyStopping

    es = EarlyStopping(patience=3)
    assert not es(0, 0.5)
    assert not es(1, 0.4)
    assert not es(2, 0.3)
    assert es(3, 0.2)  # 3 epochs without improvement
    assert not es(4, 0.9)  # new best resets


def test_one_cycle_schedule():
    from yolort_tpu.trainer.utils import one_cycle_schedule

    sched = one_cycle_schedule(0.01, 0.1, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(0.01, rel=1e-5)
    assert float(sched(100)) == pytest.approx(0.001, rel=1e-3)
    mid = float(sched(55))
    assert 0.001 < mid < 0.01


def test_model_ema_trajectory_matches_reference_simulation():
    """Pin ModelEMA against an independent numpy simulation of the reference
    update rule (v5/utils/torch_utils.py:339-377): EMA seeded with the
    initial weights at construction, then on every optimizer step
    d = decay*(1-exp(-updates/tau)); e = e*d + p*(1-d)."""
    import numpy as np
    from yolort_tpu.trainer.utils import ModelEMA

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5,)).astype(np.float32)
    ema = ModelEMA(decay=0.9999, tau=2000.0, params={"w": jnp.asarray(p0)})

    e_sim = p0.copy()
    p = p0.copy()
    for step in range(1, 50):
        p = p - 0.05 * rng.normal(size=(5,)).astype(np.float32)  # fake SGD
        ema.update({"w": jnp.asarray(p)})
        d = 0.9999 * (1 - np.exp(-step / 2000.0))
        e_sim = e_sim * d + p * (1 - d)
        np.testing.assert_allclose(np.asarray(ema.params["w"]), e_sim, rtol=1e-5)
    # the ramp keeps early-training EMA close to (but not a copy of) params
    assert not np.array_equal(np.asarray(ema.params["w"]), p)
