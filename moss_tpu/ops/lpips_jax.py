"""LPIPS perceptual distance (VGG16 backbone) in pure JAX.

Re-implementation of the pip `lpips` package the reference trains with
(/root/reference/train_ZJU.py:27 `lpips.LPIPS(net='vgg')`, weight 0.5 in the
loss at :131): five VGG16 feature stages (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3), channel-unit-normalized, squared difference, learned 1x1 linear
heads, spatial mean, summed over stages. Inputs are [0,1] images, shifted to
[-1,1] and normalized with the lpips scaling constants.

Pretrained VGG16 + lin weights cannot be downloaded in this environment
(zero egress). Behavior:
  * load_params(path) loads a converted .npz if the user provides one
    (convert_torch_weights() documents the layout);
  * init_random(key) builds a deterministically-seeded random backbone with
    uniform lin heads. Random VGG features are a known usable perceptual
    metric family, but the absolute values will NOT match the pretrained
    LPIPS — metric-parity evaluation requires supplying real weights.
    backbone_info() reports which one the default params are, so eval
    output can mark non-comparable LPIPS values.

The math itself is parity-tested weight-for-weight against a torch replica
(tests/test_lpips_parity.py) — dropping in a converted pretrained .npz is the
only remaining step for metric parity with the pip `lpips` package; zero code
change needed.

AD surface: reverse-mode only. _conv carries a custom_vjp (hand-written
transposed-conv backward — measured faster than the im2col autodiff VJP), so
jax.jvp/jacfwd through lpips() raises; the backbone is FROZEN — lpips()
rejects traced (differentiated) backbone params outright rather than silently
returning zero weight gradients.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv architecture: (out_channels, layers_in_block)
_VGG_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# lpips input scaling (lpips/lpips.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_random(seed: int = 3407) -> Dict:
    """He-initialized random VGG backbone + uniform lin heads.

    Plain numpy leaves: the default params are cached globally, and jnp arrays
    created lazily inside a jit/shard_map trace would leak that trace's mesh
    context. Numpy constants embed cleanly into any trace.
    """
    rng = np.random.default_rng(seed)
    params: Dict = {"convs": [], "lins": []}
    in_ch = 3
    for out_ch, n_layers in _VGG_CFG:
        block = []
        for _ in range(n_layers):
            w = rng.normal(0.0, np.sqrt(2.0 / (9 * in_ch)), (3, 3, in_ch, out_ch))
            block.append({"w": w.astype(np.float32), "b": np.zeros(out_ch, np.float32)})
            in_ch = out_ch
        params["convs"].append(block)
        params["lins"].append(np.full((out_ch,), 1.0 / out_ch, np.float32))
    return params


def load_params(path: str) -> Dict:
    """Load a converted .npz: keys conv{i}_{j}_w/b (HWIO) and lin{i}."""
    data = np.load(path)
    params: Dict = {"convs": [], "lins": []}
    for i, (out_ch, n_layers) in enumerate(_VGG_CFG):
        block = []
        for j in range(n_layers):
            block.append(
                {
                    "w": np.asarray(data[f"conv{i}_{j}_w"], np.float32),
                    "b": np.asarray(data[f"conv{i}_{j}_b"], np.float32),
                }
            )
        params["convs"].append(block)
        params["lins"].append(np.asarray(data[f"lin{i}"], np.float32))
    return params


def convert_torch_weights(out_path: str):  # pragma: no cover - needs torchvision
    """Offline helper: convert torchvision VGG16 + lpips lin weights to .npz.

    Torch conv weights (O, I, kh, kw) -> HWIO; lpips lin layers are 1x1 convs
    whose (O=1, I=C, 1, 1) weights become the (C,) vectors lin{i}.
    Run wherever torchvision + lpips are installed, then copy the .npz here
    and point MOSS_LPIPS_WEIGHTS at it.
    """
    import lpips as lpips_torch  # type: ignore
    import torchvision  # type: ignore

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    net = lpips_torch.LPIPS(net="vgg")
    out: Dict[str, np.ndarray] = {}
    # vgg16.features conv indices per stage (conv layers only, pools between)
    conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    for i, idxs in enumerate(conv_idx):
        for j, li in enumerate(idxs):
            w = vgg[li].weight.detach().numpy()  # (O, I, kh, kw)
            out[f"conv{i}_{j}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
            out[f"conv{i}_{j}_b"] = vgg[li].bias.detach().numpy().astype(np.float32)
    for i in range(5):
        lin = getattr(net, f"lin{i}").model[-1].weight.detach().numpy()  # (1,C,1,1)
        out[f"lin{i}"] = lin.reshape(-1).astype(np.float32)
    np.savez(out_path, **out)
    return out_path


def _im2col_conv(w, b, x, dtype):
    """3x3 SAME conv as explicit 9-tap im2col + one (N*H*W, 9*Cin)@(9*Cin, Cout)
    matmul. Measured optimal in the WHOLE fused lpips program (see
    _conv_p_bwd note and PERF.md "LPIPS conv formulation")."""
    cin = w.shape[2]
    n, h, w_, _ = x.shape
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    pat = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w_, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (N, H, W, 9*Cin), tap-major to match HWIO.reshape below
    wm = jnp.asarray(w, dtype).reshape(9 * cin, -1)
    return pat @ wm + jnp.asarray(b, dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_p(w, b, x, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    return _im2col_conv(w, b, x, dtype)


def _conv_p_fwd(w, b, x, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    # residuals must be jax types — carry x's dtype in a zero-size array
    return _im2col_conv(w, b, x, dtype), (w, b, jnp.zeros((0,), x.dtype))


def _conv_p_bwd(dtype_name, res, g):
    # Input-gradient via the conv adjoint: a stride-1 SAME 3x3 conv's
    # transpose is another SAME 3x3 conv with the kernel rotated 180° and
    # I/O swapped. XLA's conv lowering wins in this direction (the im2col
    # autodiff VJP pays pad/slice transposes over the 9x patch tensor;
    # XLA's own conv-input-grad lowering is 10.4 ms f+b for the 512^2 64ch
    # layer alone vs ~0.4 via this explicit adjoint).
    # NOTE this im2col-fwd + conv-adjoint pairing is a measured WHOLE-PROGRAM
    # optimum — per-layer micros say lax.conv/width-folding beat im2col by
    # 2-4x per conv, but every such substitution makes the fused lpips f+b
    # program slower (7.50 -> 8.0-10.1 ms; PERF.md "LPIPS conv formulation").
    # The LPIPS backbone is frozen (the reference trains through lpips as a
    # fixed metric, train_ZJU.py:121) — weight/bias cotangents are symbolic
    # zeros that XLA dead-code-eliminates.
    w, b, x_proto = res
    x_dtype = x_proto.dtype
    dtype = jnp.dtype(dtype_name)
    wj = jnp.asarray(w, dtype)
    w_flip = wj[::-1, ::-1].transpose(0, 1, 3, 2)  # (3,3,O,I)
    dx = jax.lax.conv_general_dilated(
        g.astype(dtype), w_flip, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x_dtype)
    return (jnp.zeros_like(w), jnp.zeros_like(b), dx)


_conv_p.defvjp(_conv_p_fwd, _conv_p_bwd)


def _conv(p, x, dtype):
    # output dtype == input dtype so downstream VJPs see matching dtypes; the
    # TPU matmul/conv still accumulates in f32 for bf16 operands
    return _conv_p(p["w"], p["b"], x, jnp.dtype(dtype).name)


def _features(params, x, dtype) -> List[jnp.ndarray]:
    """x: (N, H, W, 3) in lpips-normalized space -> 5 stage features."""
    feats = []
    h = x
    for bi, block in enumerate(params["convs"]):
        for p in block:
            h = jax.nn.relu(_conv(p, h, dtype))
        feats.append(h)
        if bi < len(params["convs"]) - 1:
            h = _maxpool2(h)
    return feats


def _maxpool2(h):
    """2x2/2 max pool as reshape+max. Matches reduce_window(VALID) exactly
    (odd trailing row/col dropped), but its autodiff is an equality-select
    instead of reduce_window's select_and_scatter lowering — measured f+b
    1.67 -> 1.06 ms (512^2 C=64) and 0.90 -> 0.20 ms (256^2 C=128) on v5e."""
    n, hh, ww, c = h.shape
    h = h[:, : (hh // 2) * 2, : (ww // 2) * 2, :]
    return jnp.max(h.reshape(n, hh // 2, 2, ww // 2, 2, c), axis=(2, 4))


def _norm_input(im):
    # The reference calls pip lpips with the DEFAULT normalize=False
    # (train_ZJU.py:121 `loss_fn_vgg(img_pred, img_gt)`): the [0,1] images go
    # straight into the ScalingLayer with NO [-1,1] shift. Reproducing that
    # as-executed behavior is required for its committed LPIPS numbers
    # (result/ZJU.txt) to be comparable — do not "fix" this to 2*im-1.
    return (im - _SHIFT) / _SCALE


def gt_features(params: Dict, img, dtype=jnp.bfloat16) -> List[jnp.ndarray]:
    """Precompute the (static) ground-truth tower for lpips(cached_f2=...).

    The gt image never changes across training steps, so its VGG tower —
    a full forward every iteration in the reference (train_ZJU.py:121) — can
    be computed once per frame at staging time and reused for the whole run.
    Returns the 5 stage feature maps (1, H', W', C) in `dtype`.
    """
    return _features(params, _norm_input(img)[None], dtype)


def gt_feature_bytes(h: int, w: int, dtype_bytes: int = 2) -> int:
    """Per-frame byte cost of a cached gt tower at input size (h, w)."""
    total = 0
    for out_ch, _ in _VGG_CFG:
        total += h * w * out_ch * dtype_bytes
        h, w = max(h // 2, 1), max(w // 2, 1)
    return total


def lpips(params: Dict, img1, img2=None, dtype=jnp.float32, cached_f2=None):
    """Perceptual distance. Images (H, W, 3) in [0, 1]. Returns scalar.

    dtype: activation dtype for the VGG towers. The metric path keeps the
    default f32 (parity with the torch lpips reference); the training loss
    passes bf16 — v5e MXU convs already run inputs at bf16 precision, so
    bf16 activations only halve the HBM traffic of the memory-bound conv
    stages (the unit-normalize + distance head stays f32 either way).

    cached_f2: optional precomputed gt tower (gt_features) replacing img2 —
    saves one full VGG forward per step when the target is static.
    """
    _assert_frozen_backbone(params)
    x1 = _norm_input(img1)[None]
    f1 = _features(params, x1, dtype)
    if cached_f2 is not None:
        f2 = cached_f2
    else:
        f2 = _features(params, _norm_input(img2)[None], dtype)
    total = 0.0
    for a, b, lin in zip(f1, f2, params["lins"]):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        # sum_c lin_c (a_c/|a| - b_c/|b|)^2 expanded into three lin-weighted
        # channel dots — one fused pass over a and b instead of materializing
        # the unit-normalized feature maps (the head was ~2.6 ms of a 6 ms
        # forward at 512^2; algebraically identical up to fp reassociation)
        inv_a = 1.0 / (jnp.sqrt(jnp.sum(a * a, axis=-1)) + 1e-10)
        inv_b = 1.0 / (jnp.sqrt(jnp.sum(b * b, axis=-1)) + 1e-10)
        aa = jnp.sum(a * a * lin, axis=-1)
        bb = jnp.sum(b * b * lin, axis=-1)
        ab = jnp.sum(a * b * lin, axis=-1)
        d = aa * inv_a * inv_a + bb * inv_b * inv_b - 2.0 * ab * inv_a * inv_b
        total = total + jnp.mean(d)
    return total


def _assert_frozen_backbone(params: Dict) -> None:
    """The LPIPS backbone is frozen (the reference trains through lpips as a
    fixed metric, train_ZJU.py:121): _conv's custom VJP returns hard-zero
    weight/bias cotangents, so differentiating wrt the backbone params would
    silently yield zeros. Reject traced params loudly instead (advisor
    finding, ADVICE.md r1)."""
    import jax.core

    for leaf in jax.tree.leaves(params):
        if isinstance(leaf, jax.core.Tracer):
            raise TypeError(
                "lpips() backbone params are frozen: _conv's custom VJP "
                "returns zero weight/bias cotangents, so jax.grad/vmap-traced "
                "backbone params would silently get zero gradients. Pass the "
                "params as concrete (numpy) constants; to finetune the "
                "backbone, replace _conv's VJP with real w/b cotangents first."
            )


_DEFAULT_PARAMS = None
_DEFAULT_BACKBONE = ("unset", None)


def get_default_params() -> Dict:
    """Pretrained weights if MOSS_LPIPS_WEIGHTS points at a .npz, else the
    deterministic random backbone (documented fallback)."""
    global _DEFAULT_PARAMS, _DEFAULT_BACKBONE
    if _DEFAULT_PARAMS is None:
        path = os.environ.get("MOSS_LPIPS_WEIGHTS", "")
        if path and os.path.exists(path):
            _DEFAULT_PARAMS = load_params(path)
            _DEFAULT_BACKBONE = ("pretrained", path)
        else:
            _DEFAULT_PARAMS = init_random(3407)
            _DEFAULT_BACKBONE = ("random", None)
    return _DEFAULT_PARAMS


def backbone_info():
    """('pretrained', path) or ('random', None) for the default params.

    LPIPS values from the random backbone are well-defined but NOT comparable
    to the reference's pretrained-VGG numbers (BASELINE.md) — eval outputs
    mark them (train/observability.append_result_line note)."""
    get_default_params()
    return _DEFAULT_BACKBONE


def result_note():
    """Marker string for result files/eval output, or None when the default
    backbone is pretrained (values then comparable to the reference)."""
    kind, _ = backbone_info()
    if kind == "pretrained":
        return None
    return ("LPIPS from random fallback backbone — not comparable to "
            "reference (set MOSS_LPIPS_WEIGHTS)")
