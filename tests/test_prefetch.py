"""Streaming data layer: prefetch iterator + lazy-test-split evaluate + TB dumps.

SURVEY §3.5 / VERDICT r1 weak #6: the reference keeps every decoded frame on
the GPU for the whole run; the trainer must instead stream large (test) splits
so peak device memory is independent of split size.
"""
import dataclasses

import numpy as np
import pytest

from moss_tpu.config import Config, ModelConfig
from moss_tpu.data.prefetch import iter_frames
from moss_tpu.data.synthetic import make_frames, make_scene
from moss_tpu.train.trainer import Trainer


class LazySpec:
    """FrameSpec stand-in: defers to a prebuilt Frame, counts decodes."""

    def __init__(self, frame, counter):
        self.frame = frame
        self.counter = counter

    def load(self, crop_hw=None):
        self.counter[0] += 1
        return self.frame


class TestIterFrames:
    def test_passthrough_loaded_frames(self):
        items = [object(), object()]
        assert list(iter_frames(items)) == items

    def test_decodes_in_order_and_lazily(self):
        scene = make_scene(n_verts=50)
        frames, _ = make_frames(scene, n_frames=3, H=32, W=32, crop=16)
        counter = [0]
        specs = [LazySpec(f, counter) for f in frames]
        out = list(iter_frames(specs, depth=1))
        assert len(out) == 3 and out[0] is frames[0] and out[2] is frames[2]
        assert counter[0] == 3

    def test_early_break_stops_decoding(self):
        import time

        counter = [0]
        frames = [object() for _ in range(50)]
        specs = [LazySpec(f, counter) for f in frames]
        for i, _ in enumerate(iter_frames(specs, depth=1)):
            if i == 2:
                break
        time.sleep(0.5)  # give the worker time to misbehave if it would
        assert counter[0] <= 6  # 3 consumed + bounded lookahead, not all 50

    def test_worker_exception_propagates(self):
        class Boom:
            def load(self, crop_hw=None):
                raise RuntimeError("decode failed")

        with pytest.raises(RuntimeError, match="decode failed"):
            list(iter_frames([Boom()]))


class FakeTB:
    def __init__(self):
        self.images = {}
        self.hists = {}
        self.scalars = {}

    def image(self, tag, img, step):
        self.images[tag] = (np.asarray(img), step)

    def histogram(self, tag, values, step):
        self.hists[tag] = (np.asarray(values), step)

    def scalar(self, tag, value, step):
        self.scalars[tag] = (value, step)


@pytest.fixture(scope="module")
def small_trainer():
    scene = make_scene(n_verts=100)
    frames, _ = make_frames(scene, n_frames=5, H=32, W=32, crop=16)
    cfg = Config(model=ModelConfig(sh_degree=1, capacity=256, n_init_points=100))
    tr = Trainer(scene, frames[:2], frames[2:], cfg, crop_hw=(16, 16), tb=FakeTB())
    return tr, frames


class TestStreamedEvaluate:
    def test_lazy_equals_eager(self, small_trainer):
        tr, frames = small_trainer
        eager = tr.evaluate(frames[2:])
        counter = [0]
        lazy = tr.evaluate([LazySpec(f, counter) for f in frames[2:]])
        assert counter[0] == 3
        for k in ("psnr", "ssim", "lpips"):
            assert eager[k] == pytest.approx(lazy[k], rel=1e-6)

    def test_tb_dumps_on_eval(self, small_trainer):
        tr, frames = small_trainer
        tr._tb_gt_logged = False
        m = tr.evaluate(tb_step=7)
        tb = tr.tb
        # first-5 renders + gt-once + opacity histogram + total_points
        # (training_report parity, train_ZJU.py:249-263)
        assert "test/view_0/render" in tb.images
        assert "test/view_2/render" in tb.images
        assert "test/view_0/ground_truth" in tb.images
        assert tb.images["test/view_0/render"][1] == 7
        assert "scene/opacity_histogram" in tb.hists
        assert tb.scalars["scene/total_points"][0] == 100
        # gt logged only once
        tb.images.clear()
        tr.evaluate(tb_step=8)
        assert "test/view_0/render" in tb.images
        assert "test/view_0/ground_truth" not in tb.images
        assert np.isfinite(m["psnr"])
