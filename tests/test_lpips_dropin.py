"""MOSS_LPIPS_WEIGHTS drop-in chain (VERDICT r2 next-step 10).

The reference trains/evaluates with pip lpips' pretrained VGG
(/root/reference/train_ZJU.py:27,121); zero-egress means this repo ships a
random fallback backbone. This test keeps the drop-in path known-good: a
converter-layout .npz (lpips_jax.convert_torch_weights key schema, random
values) is written, loaded via MOSS_LPIPS_WEIGHTS, and must flow end to end —
get_default_params -> backbone_info() == ('pretrained', path) ->
Trainer.evaluate's `lpips_backbone` provenance field -> result_note() is None
(values then reference-comparable, no marker in result files).
"""
import numpy as np
import pytest

from moss_tpu.ops import lpips_jax


def _write_converter_npz(path):
    """Random weights in the exact convert_torch_weights layout
    (conv{i}_{j}_w HWIO, conv{i}_{j}_b, lin{i})."""
    rng = np.random.default_rng(0)
    out = {}
    in_ch = 3
    for i, (out_ch, n_layers) in enumerate(lpips_jax._VGG_CFG):
        for j in range(n_layers):
            out[f"conv{i}_{j}_w"] = rng.normal(
                0, 0.05, (3, 3, in_ch, out_ch)).astype(np.float32)
            out[f"conv{i}_{j}_b"] = rng.normal(0, 0.01, out_ch).astype(
                np.float32)
            in_ch = out_ch
        out[f"lin{i}"] = rng.uniform(0, 2 / out_ch, out_ch).astype(np.float32)
    np.savez(path, **out)
    return out


@pytest.fixture
def fresh_default_cache():
    """Reset the module-level default-params cache around the test."""
    saved = (lpips_jax._DEFAULT_PARAMS, lpips_jax._DEFAULT_BACKBONE)
    lpips_jax._DEFAULT_PARAMS = None
    lpips_jax._DEFAULT_BACKBONE = ("unset", None)
    yield
    lpips_jax._DEFAULT_PARAMS, lpips_jax._DEFAULT_BACKBONE = saved


def test_dropin_weights_load_and_mark_pretrained(
        tmp_path, monkeypatch, fresh_default_cache):
    path = str(tmp_path / "vgg_lpips.npz")
    raw = _write_converter_npz(path)
    monkeypatch.setenv("MOSS_LPIPS_WEIGHTS", path)

    params = lpips_jax.get_default_params()
    assert lpips_jax.backbone_info() == ("pretrained", path)
    assert lpips_jax.result_note() is None
    # weights actually came from the file, layer for layer
    np.testing.assert_array_equal(params["convs"][0][0]["w"],
                                  raw["conv0_0_w"])
    np.testing.assert_array_equal(params["convs"][4][2]["b"],
                                  raw["conv4_2_b"])
    np.testing.assert_array_equal(params["lins"][3], raw["lin3"])
    # and the metric is computable with them
    img = np.clip(np.random.default_rng(1).normal(0.5, 0.2, (64, 64, 3)), 0, 1)
    v = float(lpips_jax.lpips(params, img, np.roll(img, 5, axis=0)))
    assert np.isfinite(v) and v > 0


def test_dropin_flows_through_trainer_evaluate(
        tmp_path, monkeypatch, fresh_default_cache):
    path = str(tmp_path / "vgg_lpips.npz")
    _write_converter_npz(path)
    monkeypatch.setenv("MOSS_LPIPS_WEIGHTS", path)

    from moss_tpu.config import Config, ModelConfig, OptimConfig, PipelineConfig
    from moss_tpu.data.synthetic import make_frames, make_scene
    from moss_tpu.train.trainer import Trainer

    scene = make_scene(n_verts=200)
    frames, _ = make_frames(scene, n_frames=2, H=64, W=64)
    cfg = Config(
        model=ModelConfig(sh_degree=1, capacity=256, n_init_points=200),
        optim=OptimConfig(iterations=2),
        pipe=PipelineConfig(rasterizer="reference"),
    )
    tr = Trainer(scene, frames, frames[:1], cfg)
    m = tr.evaluate()
    assert m["lpips_backbone"] == "pretrained"
    assert np.isfinite(m["lpips"])

    # ...all the way into the reference-format result file, with NO
    # not-comparable marker (the drivers pass note=result_note()) — the day
    # real weights land, quality-parity evaluation is a single env var
    from moss_tpu.train.observability import append_result_line

    result = str(tmp_path / "result.txt")
    append_result_line(result, 3000, m["psnr"], m["ssim"], m["lpips"],
                       note=lpips_jax.result_note())
    line = open(result).read().strip()
    assert "#" not in line and "not comparable" not in line, line
    it, psnr, ssim, lp1000 = line.split()
    assert int(it) == 3000
    assert float(lp1000) == pytest.approx(m["lpips"] * 1000)


def test_random_fallback_is_marked_in_result_line(tmp_path,
                                                  fresh_default_cache,
                                                  monkeypatch):
    # the inverse guard: WITHOUT the weight file the line must carry the
    # marker, so random-backbone numbers can never masquerade as comparable
    monkeypatch.delenv("MOSS_LPIPS_WEIGHTS", raising=False)
    lpips_jax.get_default_params()
    assert lpips_jax.backbone_info()[0] == "random"
    from moss_tpu.train.observability import append_result_line

    result = str(tmp_path / "result.txt")
    append_result_line(result, 3000, 30.0, 0.97, 0.015,
                       note=lpips_jax.result_note())
    assert "random fallback" in open(result).read()
