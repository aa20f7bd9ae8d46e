"""LPIPS perceptual metric (net-lin), TPU-native rebuild of the reference's
vendored PerceptualSimilarity: lama/saicinpainting/evaluation/losses/lpips.py
(PNetLin :533-600, ScalingLayer :603-610, NetLinLayer :613-622, backbone
slices :817-860 vgg16 / :767-806 alexnet, normalize_tensor :45-47,
spatial_average :521-522) with the REAL linear-calibration weights shipped at
lama/models/lpips_models/{vgg,alex}.pth.

Semantics (version 0.1, lpips=True, spatial=False):
  inputs in [0,1] → scaled to [-1,1] → ScalingLayer (shift/scale buffers) →
  backbone feature slices → per-layer channel-unit-normalize →
  squared difference → 1×1 lin conv (the .pth weights) → spatial mean →
  sum over layers.

IMPORTANT backbone caveat: the reference builds its backbone from torchvision
ImageNet weights (`tv.vgg16(pretrained=True)`, lpips.py:811), which do not
exist in this environment (zero egress; the .pth files above contain ONLY the
five 1×1 lin heads). `load_lpips` therefore accepts a converted backbone
checkpoint when one exists and otherwise falls back to a DETERMINISTIC
He-initialized backbone (seed 0), stamped ``backbone="random(seed0)"`` in the
returned params. Scores from a random backbone are a relative texture-
similarity instrument (random conv features + the real calibration heads),
NOT canonical LPIPS — every consumer must surface the stamp. The architecture
and converter are exact: with real torchvision weights the metric is
bit-faithful (validated against a from-scratch torch oracle in
tests/test_lpips.py with shared weights).

Layout is NHWC (TPU-native; channels on the 128-lane axis) vs the reference's
NCHW; convs are lax.conv_general_dilated so XLA tiles them onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ScalingLayer buffers (lpips.py:606-607)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (out_ch, kernel, stride, pad, followed_by_maxpool_before) per conv, plus the
# slice boundaries in torchvision `features` indices (lpips.py:817-834).
# VGG16 features: conv3x3/pad1 stacks, maxpool k2 s2 between blocks.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# relu indices (within the conv list, 0-based) after which a slice ends:
# relu1_2 (conv 1), relu2_2 (conv 3), relu3_3 (conv 6), relu4_3 (conv 9),
# relu5_3 (conv 12)
_VGG_TAPS = (1, 3, 6, 9, 12)
_VGG_LINS = (64, 128, 256, 512, 512)

# AlexNet features (lpips.py:767-786): (out, k, stride, pad); "M" = maxpool
# k3 s2 (torchvision). Taps after every relu.
_ALEX_CFG: List = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M",
                   (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1)]
_ALEX_TAPS = (0, 1, 2, 3, 4)   # after each conv's relu
_ALEX_LINS = (64, 192, 384, 256, 256)


def _conv_shapes(net: str) -> List[Tuple[int, int, int, int, int]]:
    """[(in_ch, out_ch, k, stride, pad)] for every conv in `net`'s features."""
    out = []
    c_in = 3
    if net == "vgg":
        for v in _VGG_CFG:
            if v == "M":
                continue
            out.append((c_in, v, 3, 1, 1))
            c_in = v
    elif net == "alex":
        for v in _ALEX_CFG:
            if v == "M":
                continue
            o, k, s, p = v
            out.append((c_in, o, k, s, p))
            c_in = o
    else:
        raise ValueError(f"net must be 'vgg' or 'alex', got {net!r}")
    return out


def init_backbone(net: str = "vgg", seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic He-init backbone (the offline fallback; see module doc).
    Weights are HWIO (NHWC conv layout)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {}
    for i, (ci, co, k, _s, _p) in enumerate(_conv_shapes(net)):
        fan_in = ci * k * k
        params[f"conv{i}_w"] = (rng.standard_normal((k, k, ci, co))
                                * np.sqrt(2.0 / fan_in)).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros(co, np.float32)
    return params


def convert_backbone_checkpoint(state_dict: Dict[str, np.ndarray],
                                net: str = "vgg") -> Dict[str, np.ndarray]:
    """torchvision `features.*.{weight,bias}` (OIHW) → our HWIO conv dict.
    Accepts either torchvision index keys or our own conv{i}_{w,b} keys."""
    shapes = _conv_shapes(net)
    # torchvision features indices of the convs, in order
    if net == "vgg":
        tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    else:
        tv_idx = [0, 3, 6, 8, 10]
    params = {}
    for i, ((ci, co, k, _s, _p), ti) in enumerate(zip(shapes, tv_idx)):
        for cand in (f"features.{ti}.weight", f"conv{i}_w"):
            if cand in state_dict:
                w = np.asarray(state_dict[cand], np.float32)
                break
        else:
            raise KeyError(f"missing conv {i} (features.{ti}.weight)")
        if w.shape != (co, ci, k, k):
            raise ValueError(f"conv {i}: expected {(co, ci, k, k)}, "
                             f"got {w.shape}")
        params[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
        for cand in (f"features.{ti}.bias", f"conv{i}_b"):
            if cand in state_dict:
                params[f"conv{i}_b"] = np.asarray(state_dict[cand],
                                                  np.float32)
                break
        else:
            raise KeyError(f"missing conv {i} bias")
    return params


def convert_lpips_checkpoint(state_dict, net: str = "vgg") -> List[np.ndarray]:
    """lama/models/lpips_models/{net}.pth (`lin{k}.model.1.weight` [1,C,1,1])
    → list of [C] non-negative calibration vectors."""
    lins_c = _VGG_LINS if net == "vgg" else _ALEX_LINS
    out = []
    for k, c in enumerate(lins_c):
        w = np.asarray(state_dict[f"lin{k}.model.1.weight"], np.float32)
        if w.shape != (1, c, 1, 1):
            raise ValueError(f"lin{k}: expected (1,{c},1,1), got {w.shape}")
        out.append(w.reshape(c))
    return out


def load_lpips(net: str = "vgg",
               lin_path: Optional[str] = None,
               backbone_path: Optional[str] = None,
               seed: int = 0) -> dict:
    """Assemble LPIPS params. `lin_path` defaults to the reference's shipped
    weights if readable; `backbone_path` (a converted .npz) is optional —
    absent, the deterministic random backbone is used and stamped."""
    import os
    if lin_path is None:
        cand = f"/root/reference/lama/models/lpips_models/{net}.pth"
        lin_path = cand if os.path.exists(cand) else None
    lins = None
    lin_source = "none"
    if lin_path and os.path.exists(lin_path):
        if lin_path.endswith(".npz"):
            d = np.load(lin_path)
            lins = [d[f"lin{k}"] for k in range(len(
                _VGG_LINS if net == "vgg" else _ALEX_LINS))]
        else:
            import torch
            sd = torch.load(lin_path, map_location="cpu")
            lins = convert_lpips_checkpoint(
                {k: v.numpy() for k, v in sd.items()}, net)
        lin_source = f"checkpoint:{os.path.basename(lin_path)}"
    else:
        lins = [np.ones(c, np.float32) / c
                for c in (_VGG_LINS if net == "vgg" else _ALEX_LINS)]
    if backbone_path and os.path.exists(backbone_path):
        d = np.load(backbone_path)
        backbone = convert_backbone_checkpoint(dict(d), net)
        backbone_source = f"checkpoint:{os.path.basename(backbone_path)}"
    else:
        backbone = init_backbone(net, seed)
        backbone_source = f"random(seed{seed})"
    return {"net": net, "backbone": backbone, "lins": lins,
            "backbone_source": backbone_source, "lin_source": lin_source}


def _features(x, backbone: dict, net: str):
    """Backbone slice outputs (post-relu taps). x: [N,H,W,3] scaled input."""
    import jax.numpy as jnp
    from jax import lax

    def conv(x, w, b, stride, pad):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.asarray(b)

    def maxpool(x, k, s):
        return lax.reduce_window(x, -jnp.inf, lax.max,
                                 (1, k, k, 1), (1, s, s, 1), "VALID")

    taps = []
    ci = 0
    cfg = _VGG_CFG if net == "vgg" else _ALEX_CFG
    tap_set = set(_VGG_TAPS if net == "vgg" else _ALEX_TAPS)
    pool = (2, 2) if net == "vgg" else (3, 2)
    for v in cfg:
        if v == "M":
            x = maxpool(x, *pool)
            continue
        if net == "vgg":
            stride, padv = 1, 1
        else:
            _o, _k, stride, padv = v
        x = jnp.maximum(
            conv(x, backbone[f"conv{ci}_w"], backbone[f"conv{ci}_b"],
                 stride, padv), 0.0)
        if ci in tap_set:
            taps.append(x)
        ci += 1
    return taps


def _lpips_fn(img0, img1, backbone, lins, net: str, normalize: bool):
    import jax.numpy as jnp

    if normalize:  # [0,1] → [-1,1] (PerceptualLoss.forward, lpips.py:29-36)
        img0 = 2.0 * img0 - 1.0
        img1 = 2.0 * img1 - 1.0
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    img0 = (img0 - shift) / scale
    img1 = (img1 - shift) / scale
    f0 = _features(img0, backbone, net)
    f1 = _features(img1, backbone, net)
    total = 0.0
    for a, b, lin in zip(f0, f1, lins):
        # normalize_tensor (lpips.py:45-47): unit-norm over channels
        na = a / (jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b * b, -1, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        # NetLinLayer 1×1 conv == channel dot; then spatial average
        total = total + jnp.mean(d @ jnp.asarray(lin), axis=(1, 2))
    return total


@functools.lru_cache(maxsize=4)
def _jitted(net: str, normalize: bool):
    import jax
    return jax.jit(functools.partial(_lpips_fn, net=net, normalize=normalize),
                   static_argnames=())


def lpips(img0: np.ndarray, img1: np.ndarray, params: dict,
          normalize: bool = True) -> np.ndarray:
    """LPIPS distance per batch item. img*: [N,H,W,3] (or [H,W,3]) float in
    [0,1] (normalize=True, the evaluator's convention) or [-1,1]."""
    import jax.numpy as jnp
    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    squeeze = img0.ndim == 3
    if squeeze:
        img0, img1 = img0[None], img1[None]
    fn = _jitted(params["net"], normalize)
    out = np.asarray(fn(img0, img1, params["backbone"],
                        tuple(params["lins"])))
    # scalar for single-image calls (3-D input OR a 4-D batch of one) so
    # float(lpips(...)) call sites never hit NumPy's ndim>0→scalar deprecation
    return float(out[0]) if (squeeze or out.shape == (1,)) else out
