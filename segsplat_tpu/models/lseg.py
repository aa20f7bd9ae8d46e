"""LSeg (Language-driven Semantic Segmentation) in Flax — dense per-pixel CLIP
features on TPU.

Replaces the reference's lang-seg submodule (consumed at
script/extract_lseg_features.py:19,50-62 and voxel_to_gaussian/
voxeltoGaussian_logits.py:162-199): a CLIP-style ViT-L/16 backbone with a
DPT decode head emitting 512-D per-pixel embeddings that live in CLIP text space,
plus the text-similarity scoring head.

Architecture follows the public LSeg/DPT design: ViT patch embed (16×16), class
token, 24 pre-LN blocks; features tapped after blocks {5,11,17,23}; per-tap
readout-projection + reassemble to 4 scales (×4, ×2, ×1, ×½); RefineNet-style
fusion with residual conv units; 1×1 head to 512 channels at half input
resolution. Scoring: logits = logit_scale · norm(pixel) @ norm(text)ᵀ.

TPU notes: all convs NHWC (XLA-native layout); attention/matmuls run in bf16 with
f32 accumulation when ``compute_dtype=bfloat16`` — MXU-friendly; whole forward is
one jit program (the reference runs per-image through a torch pipeline with CPU
resize staging, prepare_tensor_data.py:117-127).

Weights: ``convert_lseg_checkpoint`` maps the public demo_e200.ckpt torch state
dict (timm-ViT naming) onto this module; without a checkpoint the model runs
deterministically random-initialized so the pipeline stays executable offline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        # exact (erf) GELU — timm ViT / DPT use torch nn.GELU, not tanh approx
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            deterministic=True, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = MlpBlock(self.dim, self.dim * 4, self.dtype, name="mlp")(y)
        return x + y


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        return x + y


def _ac_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix with align_corners=True
    endpoint mapping (torch F.interpolate(..., align_corners=True) semantics,
    which DPT/LSeg fusion uses — NOT half-pixel centers)."""
    if n_in == 1 or n_out == 1:
        return np.ones((n_out, n_in), np.float32) / n_in
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = (src - i0).astype(np.float32)
    a = np.zeros((n_out, n_in), np.float32)
    a[np.arange(n_out), i0] += 1.0 - f
    a[np.arange(n_out), i1] += f
    return a


def resize_bilinear_align_corners(x: jax.Array, oh: int, ow: int) -> jax.Array:
    """Bilinear resize of [B,H,W,C] with align_corners=True, as two small
    matmuls (MXU-friendly; shapes are static so the matrices are constants)."""
    b, h, w, c = x.shape
    ah = jnp.asarray(_ac_matrix(h, oh), x.dtype)
    aw = jnp.asarray(_ac_matrix(w, ow), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("pw,bowc->bopc", aw, y)


class FusionBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        b, h, w, c = x.shape
        x = resize_bilinear_align_corners(x, 2 * h, 2 * w)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class LSegNet(nn.Module):
    """ViT backbone + DPT head → [B, H/2, W/2, out_dim] CLIP-space features."""

    patch: int = 16
    width: int = 1024
    depth: int = 24
    heads: int = 16
    taps: Sequence[int] = (5, 11, 17, 23)
    fusion_features: int = 256
    reassemble_dims: Sequence[int] = (256, 512, 1024, 1024)
    out_dim: int = 512
    image_size: int = 384          # pos-embed native size; other sizes interpolate
    compute_dtype: Any = jnp.float32
    # ImageNet stats: the reference normalizes input images with these OUTSIDE
    # the torch model (extract_lseg_features.py:69); we fold the same transform
    # into the forward so callers feed raw [0,1] images.
    norm_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images [B, H, W, 3] in [0,1], H and W multiples of 2·patch."""
        B, H, W, _ = images.shape
        dt = self.compute_dtype
        mean = jnp.asarray(self.norm_mean); std = jnp.asarray(self.norm_std)
        x = (images - mean) / std
        x = x.astype(dt)

        gh, gw = H // self.patch, W // self.patch
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=dt, name="patch_embed")(x)
        x = x.reshape(B, gh * gw, self.width)

        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, self.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1 + (self.image_size // self.patch) ** 2, self.width))
        pos_grid = pos[1:].reshape(self.image_size // self.patch,
                                   self.image_size // self.patch, self.width)
        if (gh, gw) != pos_grid.shape[:2]:
            pos_grid = jax.image.resize(pos_grid, (gh, gw, self.width), "bilinear")
        x = x + pos_grid.reshape(1, gh * gw, self.width).astype(dt)
        cls = jnp.broadcast_to(cls_tok, (B, 1, self.width)).astype(dt) \
            + pos[:1][None].astype(dt)
        x = jnp.concatenate([cls, x], axis=1)

        tapped = []
        for i in range(self.depth):
            x = ViTBlock(self.width, self.heads, dt, name=f"block_{i}")(x)
            if i in self.taps:
                tapped.append(x)

        # readout-project + reassemble each tap
        scales = []
        for t, (feat, rdim) in enumerate(zip(tapped, self.reassemble_dims)):
            cls_t, patches = feat[:, :1], feat[:, 1:]
            merged = jnp.concatenate(
                [patches, jnp.broadcast_to(cls_t, patches.shape)], axis=-1)
            proj = nn.Dense(self.width, dtype=dt, name=f"readout_{t}")(merged)
            proj = nn.gelu(proj, approximate=False)
            fmap = proj.reshape(B, gh, gw, self.width)
            fmap = nn.Conv(rdim, (1, 1), dtype=dt, name=f"reassemble_{t}")(fmap)
            if t == 0:      # ×4 — LEARNED deconv (DPT act_postprocess1.4)
                fmap = nn.ConvTranspose(rdim, (4, 4), strides=(4, 4),
                                        transpose_kernel=True, dtype=dt,
                                        name="upsample_0")(fmap)
            elif t == 1:    # ×2 — LEARNED deconv (DPT act_postprocess2.4)
                fmap = nn.ConvTranspose(rdim, (2, 2), strides=(2, 2),
                                        transpose_kernel=True, dtype=dt,
                                        name="upsample_1")(fmap)
            elif t == 3:    # ×½
                fmap = nn.Conv(rdim, (3, 3), strides=(2, 2), padding=1,
                               dtype=dt, name="downsample_3")(fmap)
            fmap = nn.Conv(self.fusion_features, (3, 3), padding=1, use_bias=False,
                           dtype=dt, name=f"scratch_{t}")(fmap)
            scales.append(fmap)

        # RefineNet fusion, deepest first
        f = FusionBlock(self.fusion_features, dt, name="fusion_3")(scales[3])
        f = FusionBlock(self.fusion_features, dt, name="fusion_2")(f, scales[2])
        f = FusionBlock(self.fusion_features, dt, name="fusion_1")(f, scales[1])
        f = FusionBlock(self.fusion_features, dt, name="fusion_0")(f, scales[0])
        # f is now at (gh·16, gw·16)/2 = H/2 × W/2
        out = nn.Conv(self.out_dim, (1, 1), dtype=dt, name="head")(f)
        return out.astype(jnp.float32)


class LSegModel:
    """Stateful convenience wrapper: params + jitted apply + scoring head."""

    def __init__(self, params: Optional[Dict] = None, seed: int = 0,
                 compute_dtype=jnp.float32, image_size: int = 384, **cfg):
        self.net = LSegNet(compute_dtype=compute_dtype, image_size=image_size, **cfg)
        self.logit_scale = jnp.asarray(np.exp(np.log(1 / 0.07)), jnp.float32)
        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 2 * self.net.patch, 2 * self.net.patch, 3))
            params = self.net.init(rng, dummy)["params"]
        else:
            ls = params.get("__logit_scale__")
            if ls is not None:
                self.logit_scale = jnp.asarray(ls)
            # don't mutate the caller's dict: a second model built from the
            # same converted checkpoint would silently lose the scale
            params = {k: v for k, v in params.items()
                      if k != "__logit_scale__"}
        self.params = params
        self._apply = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def features(self, images: jax.Array, upsample: bool = True) -> jax.Array:
        """[B,H,W,3] → per-pixel 512-D features [B,H,W,512] (or half-res)."""
        f = self._apply(self.params, images)
        if upsample:
            # lseg output_conv = Interpolate(×2, bilinear, align_corners=True)
            B, h, w, C = f.shape
            f = resize_bilinear_align_corners(f, 2 * h, 2 * w)
        return f

    def logits(self, features: jax.Array, text_emb: jax.Array) -> jax.Array:
        from segsplat_tpu.models.clip_text import project_features_to_labels
        return project_features_to_labels(features, text_emb, self.logit_scale)


def pad_to_multiple(img: np.ndarray, multiple: int = 32) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Pad H,W up to a multiple (the reference pads to /32 before LSeg,
    extract_lseg_features.py:66-78). Returns (padded, original_hw)."""
    h, w = img.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    return np.pad(img, ((0, ph), (0, pw), (0, 0))), (h, w)


def convert_lseg_checkpoint(state_dict, heads: Optional[int] = None) -> Dict[str, Any]:
    """Map the public LSeg demo checkpoint (torch, timm-ViT + DPT scratch naming)
    onto LSegNet params. Input: dict of numpy arrays (torch tensors accepted).
    ``heads`` defaults to width//64 (correct for every published timm ViT)."""
    sd = {}
    for k, v in state_dict.items():
        # strip LEADING wrapper prefixes only (lightning "net.", DDP "module.")
        for pre in ("module.", "net."):
            while k.startswith(pre):
                k = k[len(pre):]
        sd[k] = np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)

    def conv(w):  # torch OIHW → flax HWIO
        return np.transpose(w, (2, 3, 1, 0))

    p: Dict[str, Any] = {}
    pre = "pretrained.model."
    p["patch_embed"] = {"kernel": conv(sd[pre + "patch_embed.proj.weight"]),
                        "bias": sd[pre + "patch_embed.proj.bias"]}
    p["cls_token"] = sd[pre + "cls_token"].reshape(1, 1, -1)
    p["pos_embed"] = sd[pre + "pos_embed"][0]
    width = p["pos_embed"].shape[-1]
    heads = heads or width // 64
    hd = width // heads
    depth = max(int(k[len(pre + "blocks."):].split(".")[0])
                for k in sd if k.startswith(pre + "blocks.")) + 1
    for i in range(depth):
        b = f"{pre}blocks.{i}."
        qkv_w = sd[b + "attn.qkv.weight"]; qkv_b = sd[b + "attn.qkv.bias"]
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        p[f"block_{i}"] = {
            "norm1": {"scale": sd[b + "norm1.weight"], "bias": sd[b + "norm1.bias"]},
            "norm2": {"scale": sd[b + "norm2.weight"], "bias": sd[b + "norm2.bias"]},
            "attn": {
                "query": {"kernel": wq.T.reshape(width, heads, hd),
                          "bias": bq.reshape(heads, hd)},
                "key": {"kernel": wk.T.reshape(width, heads, hd),
                        "bias": bk.reshape(heads, hd)},
                "value": {"kernel": wv.T.reshape(width, heads, hd),
                          "bias": bv.reshape(heads, hd)},
                "out": {"kernel": sd[b + "attn.proj.weight"].T.reshape(heads, hd, width),
                        "bias": sd[b + "attn.proj.bias"]},
            },
            "mlp": {"fc1": {"kernel": sd[b + "mlp.fc1.weight"].T,
                            "bias": sd[b + "mlp.fc1.bias"]},
                    "fc2": {"kernel": sd[b + "mlp.fc2.weight"].T,
                            "bias": sd[b + "mlp.fc2.bias"]}},
        }
    # readout projections + reassemble convs (act_postprocess1..4)
    def deconv(w):  # torch ConvTranspose2d [in, out, kH, kW] → flax
        # nn.ConvTranspose(transpose_kernel=True) layout [kH, kW, out, in]
        return np.transpose(w, (2, 3, 1, 0))

    for t in range(4):
        ap = f"pretrained.act_postprocess{t + 1}."
        p[f"readout_{t}"] = {"kernel": sd[ap + "0.project.0.weight"].T,
                             "bias": sd[ap + "0.project.0.bias"]}
        p[f"reassemble_{t}"] = {"kernel": conv(sd[ap + "3.weight"]),
                                "bias": sd[ap + "3.bias"]}
    # tap-0/1 LEARNED deconv upsamplers (DPT act_postprocess{1,2}.4 are
    # ConvTranspose2d k4s4 / k2s2 — checkpoint weights must not be dropped)
    for t, name in ((0, "upsample_0"), (1, "upsample_1")):
        k = f"pretrained.act_postprocess{t + 1}.4."
        p[name] = {"kernel": deconv(sd[k + "weight"]), "bias": sd[k + "bias"]}
    if "pretrained.act_postprocess4.4.weight" in sd:
        p["downsample_3"] = {"kernel": conv(sd["pretrained.act_postprocess4.4.weight"]),
                             "bias": sd["pretrained.act_postprocess4.4.bias"]}
    for t in range(4):
        p[f"scratch_{t}"] = {"kernel": conv(sd[f"scratch.layer{t + 1}_rn.weight"])}
    for t in range(4):
        rf = f"scratch.refinenet{t + 1}."
        blk = {"rcu2": {
            "conv1": {"kernel": conv(sd[rf + "resConfUnit2.conv1.weight"]),
                      "bias": sd[rf + "resConfUnit2.conv1.bias"]},
            "conv2": {"kernel": conv(sd[rf + "resConfUnit2.conv2.weight"]),
                      "bias": sd[rf + "resConfUnit2.conv2.bias"]}},
            "out_conv": {"kernel": conv(sd[rf + "out_conv.weight"]),
                         "bias": sd[rf + "out_conv.bias"]}}
        if rf + "resConfUnit1.conv1.weight" in sd:
            blk["rcu1"] = {
                "conv1": {"kernel": conv(sd[rf + "resConfUnit1.conv1.weight"]),
                          "bias": sd[rf + "resConfUnit1.conv1.bias"]},
                "conv2": {"kernel": conv(sd[rf + "resConfUnit1.conv2.weight"]),
                          "bias": sd[rf + "resConfUnit1.conv2.bias"]}}
        p[f"fusion_{t}"] = blk
    p["head"] = {"kernel": conv(sd["scratch.head1.weight"]),
                 "bias": sd["scratch.head1.bias"]}
    if "logit_scale" in sd:
        # checkpoints store LOG scale; exp regardless of a stray (1,) shape
        # (a shape-gated exp left re-saved unsqueezed scales in log space:
        # ~2.66 instead of ~14.29, shrinking every similarity logit ~5.4x)
        ls = np.asarray(sd["logit_scale"], np.float32)
        p["__logit_scale__"] = np.exp(ls.reshape(()) if ls.size == 1 else ls)
    return p
