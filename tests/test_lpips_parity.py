"""LPIPS weight-for-weight parity vs a torch replica + backward/loader checks.

The reference trains with the pip `lpips` package's pretrained VGG backbone
(/root/reference/train_ZJU.py:27,121). Pretrained weights are unobtainable in
this environment, so parity is established the same way tests/test_mlps_parity
does for the correction MLPs: a torch module built from the SAME (randomly
generated) weights as ops/lpips_jax must agree on values AND input gradients.
With that proven, dropping a converted pretrained .npz into
MOSS_LPIPS_WEIGHTS is the only remaining step for metric parity — zero code
change.

The torch replica below transcribes the pip lpips math independently
(lpips/lpips.py: ScalingLayer shift/scale, VGG16 relu{1_2,2_2,3_3,4_3,5_3}
stages, unit channel normalization with eps 1e-10, 1x1 lin heads, spatial
average, stage sum).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from moss_tpu.ops import lpips_jax


def _shared_params(rng, small=True):
    """Random weights in the lpips_jax layout; optionally a thin backbone so
    the torch/jax double tower fits CPU test time."""
    if not small:
        return lpips_jax.init_random(1234)
    cfg = [(8, 2), (12, 2), (16, 3), (16, 3), (16, 3)]
    params = {"convs": [], "lins": []}
    in_ch = 3
    for out_ch, n_layers in cfg:
        block = []
        for _ in range(n_layers):
            w = rng.normal(0.0, np.sqrt(2.0 / (9 * in_ch)), (3, 3, in_ch, out_ch))
            block.append({"w": w.astype(np.float32),
                          "b": rng.normal(0, 0.05, out_ch).astype(np.float32)})
            in_ch = out_ch
        params["convs"].append(block)
        params["lins"].append(
            rng.uniform(0.01, 1.0, (out_ch,)).astype(np.float32))
    return params


def torch_lpips_replica(params, im1_t, im2_t):
    """Pip-lpips math in torch from lpips_jax-layout params. Inputs NCHW in
    [0,1], differentiable."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def norm_in(x):
        # pip lpips default normalize=False (the reference's call form):
        # [0,1] inputs hit the ScalingLayer with no [-1,1] shift
        return (x - shift) / scale

    def features(x):
        feats = []
        h = x
        for bi, block in enumerate(params["convs"]):
            for p in block:
                w = torch.as_tensor(np.transpose(p["w"], (3, 2, 0, 1)).copy())
                b = torch.as_tensor(p["b"])
                h = F.relu(F.conv2d(h, w, b, padding=1))
            feats.append(h)
            if bi < len(params["convs"]) - 1:
                h = F.max_pool2d(h, 2)
        return feats

    total = torch.zeros(())
    for a, b, lin in zip(features(norm_in(im1_t)), features(norm_in(im2_t)),
                         params["lins"]):
        an = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        bn = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (an - bn).pow(2)
        lw = torch.as_tensor(lin).view(1, -1, 1, 1)
        total = total + (d * lw).sum(1).mean()
    return total


class TestTorchParity:
    def test_value_and_input_grad(self, rng):
        params = _shared_params(rng)
        im1 = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        im2 = np.clip(im1 + rng.normal(0, 0.1, im1.shape), 0, 1).astype(np.float32)

        v_jax, g_jax = jax.value_and_grad(
            lambda x: lpips_jax.lpips(params, x, jnp.asarray(im2))
        )(jnp.asarray(im1))

        t1 = torch.as_tensor(np.transpose(im1, (2, 0, 1)).copy())[None]
        t1.requires_grad_(True)
        t2 = torch.as_tensor(np.transpose(im2, (2, 0, 1)).copy())[None]
        v_t = torch_lpips_replica(params, t1, t2)
        v_t.backward()
        g_t = np.transpose(t1.grad[0].numpy(), (1, 2, 0))

        np.testing.assert_allclose(float(v_jax), float(v_t.detach()), rtol=1e-5)
        scale = np.abs(g_t).max()
        np.testing.assert_allclose(np.asarray(g_jax), g_t, atol=2e-5 * scale,
                                   rtol=1e-4)

    def test_full_vgg16_shape_value(self, rng):
        """Full-size VGG16 backbone (the real architecture) on a small image:
        value-only parity so the 5-stage/13-conv layout is pinned too."""
        params = lpips_jax.init_random(777)
        im1 = rng.uniform(size=(40, 40, 3)).astype(np.float32)
        im2 = rng.uniform(size=(40, 40, 3)).astype(np.float32)
        v_jax = float(lpips_jax.lpips(params, jnp.asarray(im1), jnp.asarray(im2)))
        t1 = torch.as_tensor(np.transpose(im1, (2, 0, 1)).copy())[None]
        t2 = torch.as_tensor(np.transpose(im2, (2, 0, 1)).copy())[None]
        v_t = float(torch_lpips_replica(params, t1, t2))
        np.testing.assert_allclose(v_jax, v_t, rtol=2e-5)

    def test_identical_images_zero(self, rng):
        params = _shared_params(rng)
        im = rng.uniform(size=(24, 24, 3)).astype(np.float32)
        v = float(lpips_jax.lpips(params, jnp.asarray(im), jnp.asarray(im)))
        assert abs(v) < 1e-6


class TestConvBackward:
    """The hand-written transposed-conv VJP in _conv_p (ADVICE.md r1: a
    sign/transpose slip would pass every value-only test while corrupting
    training gradients)."""

    def _grads(self, rng, dtype):
        cin, cout, h, w_ = 3, 8, 12, 12
        w = rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32)
        b = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        x = rng.normal(0, 1.0, (1, h, w_, cin)).astype(np.float32)
        cot = rng.normal(0, 1.0, (1, h, w_, cout)).astype(np.float32)

        def loss_custom(x_):
            return jnp.sum(lpips_jax._conv({"w": w, "b": b}, x_, dtype)
                           .astype(jnp.float32) * cot)

        def loss_plain(x_):
            return jnp.sum(lpips_jax._im2col_conv(w, b, x_, dtype)
                           .astype(jnp.float32) * cot)

        return (jax.grad(loss_custom)(jnp.asarray(x)),
                jax.grad(loss_plain)(jnp.asarray(x)))

    def test_f32(self, rng):
        g_custom, g_auto = self._grads(rng, jnp.float32)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16(self, rng):
        g_custom, g_auto = self._grads(rng, jnp.bfloat16)
        scale = np.abs(np.asarray(g_auto)).max()
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                                   atol=3e-2 * scale)

    def test_frozen_backbone_guard(self, rng):
        """Differentiating wrt the backbone must raise loudly, not silently
        return zeros (ADVICE.md r1 medium)."""
        params = _shared_params(rng)
        im = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))

        def loss(p):
            return lpips_jax.lpips(p, im, im)

        with pytest.raises(TypeError, match="frozen"):
            jax.grad(loss)(jax.tree.map(jnp.asarray, params))


class TestWeightsLoader:
    def test_npz_roundtrip(self, rng, tmp_path):
        """The MOSS_LPIPS_WEIGHTS .npz schema documented in load_params /
        convert_torch_weights: conv{i}_{j}_w (HWIO), conv{i}_{j}_b, lin{i}."""
        params = lpips_jax.init_random(99)
        out = {}
        for i, block in enumerate(params["convs"]):
            for j, p in enumerate(block):
                out[f"conv{i}_{j}_w"] = p["w"]
                out[f"conv{i}_{j}_b"] = p["b"]
        for i, lin in enumerate(params["lins"]):
            out[f"lin{i}"] = lin
        path = tmp_path / "lpips_weights.npz"
        np.savez(path, **out)

        loaded = lpips_jax.load_params(str(path))
        im1 = rng.uniform(size=(24, 24, 3)).astype(np.float32)
        im2 = rng.uniform(size=(24, 24, 3)).astype(np.float32)
        v0 = float(lpips_jax.lpips(params, jnp.asarray(im1), jnp.asarray(im2)))
        v1 = float(lpips_jax.lpips(loaded, jnp.asarray(im1), jnp.asarray(im2)))
        assert v0 == v1

    def test_bad_schema_rejected(self, tmp_path):
        path = tmp_path / "bad.npz"
        np.savez(path, conv0_0_w=np.zeros((3, 3, 3, 64), np.float32))
        with pytest.raises(KeyError):
            lpips_jax.load_params(str(path))

    def test_default_backbone_marked_random(self, monkeypatch):
        monkeypatch.delenv("MOSS_LPIPS_WEIGHTS", raising=False)
        lpips_jax._DEFAULT_PARAMS = None
        kind, path = lpips_jax.backbone_info()
        assert kind == "random" and path is None

    def test_env_weights_marked_pretrained(self, rng, tmp_path, monkeypatch):
        params = lpips_jax.init_random(5)
        out = {}
        for i, block in enumerate(params["convs"]):
            for j, p in enumerate(block):
                out[f"conv{i}_{j}_w"], out[f"conv{i}_{j}_b"] = p["w"], p["b"]
        for i, lin in enumerate(params["lins"]):
            out[f"lin{i}"] = lin
        path = tmp_path / "w.npz"
        np.savez(path, **out)
        monkeypatch.setenv("MOSS_LPIPS_WEIGHTS", str(path))
        lpips_jax._DEFAULT_PARAMS = None
        kind, p = lpips_jax.backbone_info()
        assert kind == "pretrained" and p == str(path)
        # restore the module-global default for other tests
        lpips_jax._DEFAULT_PARAMS = None
        monkeypatch.delenv("MOSS_LPIPS_WEIGHTS")
        lpips_jax.get_default_params()


class TestMaxpoolReshape:
    """_maxpool2 (reshape+max) must match reduce_window(VALID) exactly —
    values and gradients — including odd trailing rows/cols (dropped)."""

    @pytest.mark.parametrize("hw", [(8, 8), (9, 8), (8, 9), (11, 13)])
    def test_matches_reduce_window(self, hw):
        import jax
        import jax.numpy as jnp

        h, w = hw
        rng = np.random.default_rng(h * 100 + w)
        x = jnp.asarray(rng.normal(size=(1, h, w, 5)).astype(np.float32))

        def rw(x):
            return jax.lax.reduce_window(
                x, x.dtype.type(-jnp.inf), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        y_rs = lpips_jax._maxpool2(x)
        y_rw = rw(x)
        np.testing.assert_array_equal(np.asarray(y_rs), np.asarray(y_rw))

        g_rs = jax.grad(lambda x: jnp.sum(lpips_jax._maxpool2(x) ** 2))(x)
        g_rw = jax.grad(lambda x: jnp.sum(rw(x) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_rs), np.asarray(g_rw),
                                   atol=1e-6)
