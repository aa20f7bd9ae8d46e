"""Weight-converter tests (VERDICT round-1 item #3): synthetic torch-naming
state dicts through convert_lseg_checkpoint / convert_torch_clip_text, checked
against independent numpy oracles — a key-naming or transpose mistake must not
be able to ship silently.

Reference weight paths: script/extract_lseg_features.py:43-62 (demo_e200.ckpt),
voxel_to_gaussian/voxeltoGaussian_logits.py:162-199 (CLIP text embeddings).
"""

import gzip
import os

import numpy as np
import pytest
from scipy.special import erf

import jax
import jax.numpy as jnp


# ───────────────────────── numpy oracle primitives ─────────────────────────

def np_ln(x, g, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def np_softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def np_mha(x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal=False):
    """Torch-layout MHA: weights [out, in]; x [T, W]."""
    T, W = x.shape
    hd = W // heads
    q = (x @ wq.T + bq).reshape(T, heads, hd)
    k = (x @ wk.T + bk).reshape(T, heads, hd)
    v = (x @ wv.T + bv).reshape(T, heads, hd)
    att = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    if causal:
        att = np.where(np.tril(np.ones((T, T), bool))[None], att, -1e9)
    att = np_softmax(att)
    out = np.einsum("hqk,khd->qhd", att, v).reshape(T, W)
    return out @ wo.T + bo


def np_gelu_exact(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_quickgelu(x):
    return x / (1.0 + np.exp(-1.702 * x))


# ───────────────────────── CLIP text converter ─────────────────────────

CLIP_CFG = dict(width=64, layers=2, heads=1, embed_dim=32, vocab_size=50,
                context_length=12)


def _clip_sd(rng):
    W, L, V, C, E = (CLIP_CFG["width"], CLIP_CFG["layers"],
                     CLIP_CFG["vocab_size"], CLIP_CFG["context_length"],
                     CLIP_CFG["embed_dim"])
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    sd = {
        "token_embedding.weight": r(V, W),
        "positional_embedding": r(C, W),
        "ln_final.weight": 1 + r(W), "ln_final.bias": r(W),
        "text_projection": r(W, E),
        "logit_scale": np.float32(np.log(1 / 0.07)),
    }
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        sd[p + "attn.in_proj_weight"] = r(3 * W, W)
        sd[p + "attn.in_proj_bias"] = r(3 * W)
        sd[p + "attn.out_proj.weight"] = r(W, W)
        sd[p + "attn.out_proj.bias"] = r(W)
        sd[p + "ln_1.weight"] = 1 + r(W)
        sd[p + "ln_1.bias"] = r(W)
        sd[p + "ln_2.weight"] = 1 + r(W)
        sd[p + "ln_2.bias"] = r(W)
        sd[p + "mlp.c_fc.weight"] = r(4 * W, W)
        sd[p + "mlp.c_fc.bias"] = r(4 * W)
        sd[p + "mlp.c_proj.weight"] = r(W, 4 * W)
        sd[p + "mlp.c_proj.bias"] = r(W)
    return sd


def _np_clip_forward(sd, tokens):
    """Independent numpy forward of the CLIP text tower from the TORCH dict."""
    x = sd["token_embedding.weight"][tokens]              # [T, W]
    x = x + sd["positional_embedding"][: tokens.shape[0]]
    L = CLIP_CFG["layers"]
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        wq, wk, wv = np.split(sd[p + "attn.in_proj_weight"], 3, axis=0)
        bq, bk, bv = np.split(sd[p + "attn.in_proj_bias"], 3, axis=0)
        y = np_ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"], 1e-5)
        x = x + np_mha(y, wq, bq, wk, bk, wv, bv,
                       sd[p + "attn.out_proj.weight"],
                       sd[p + "attn.out_proj.bias"],
                       CLIP_CFG["heads"], causal=True)
        y = np_ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"], 1e-5)
        y = np_quickgelu(y @ sd[p + "mlp.c_fc.weight"].T
                         + sd[p + "mlp.c_fc.bias"])
        x = x + y @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
    x = np_ln(x, sd["ln_final.weight"], sd["ln_final.bias"], 1e-5)
    eot = int(tokens.argmax())
    return x[eot] @ sd["text_projection"]


def test_convert_torch_clip_text_matches_numpy_oracle(rng):
    from segsplat_tpu.models.clip_text import (ClipTextEncoder,
                                               convert_torch_clip_text)

    sd = _clip_sd(rng)
    params = convert_torch_clip_text(sd)
    assert float(params.pop("__logit_scale__")) == pytest.approx(1 / 0.07,
                                                                 rel=1e-5)
    model = ClipTextEncoder(**CLIP_CFG)
    tokens = np.zeros((2, CLIP_CFG["context_length"]), np.int32)
    tokens[0, :5] = [48, 3, 7, 12, 49]
    tokens[1, :4] = [48, 30, 2, 49]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
    want = np.stack([_np_clip_forward(sd, t) for t in tokens])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_convert_torch_clip_text_full_config_shapes():
    """Shape round-trip at the real CLIP ViT-B text config (49408 vocab,
    width 512, 12 layers) — zeros-valued, structure only."""
    from segsplat_tpu.models.clip_text import (ClipTextEncoder,
                                               convert_torch_clip_text)

    W, L, V, C, E = 512, 12, 49408, 77, 512
    z = lambda *s: np.zeros(s, np.float32)
    sd = {"token_embedding.weight": z(V, W), "positional_embedding": z(C, W),
          "ln_final.weight": z(W), "ln_final.bias": z(W),
          "text_projection": z(W, E)}
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        sd.update({p + "attn.in_proj_weight": z(3 * W, W),
                   p + "attn.in_proj_bias": z(3 * W),
                   p + "attn.out_proj.weight": z(W, W),
                   p + "attn.out_proj.bias": z(W),
                   p + "ln_1.weight": z(W), p + "ln_1.bias": z(W),
                   p + "ln_2.weight": z(W), p + "ln_2.bias": z(W),
                   p + "mlp.c_fc.weight": z(4 * W, W),
                   p + "mlp.c_fc.bias": z(4 * W),
                   p + "mlp.c_proj.weight": z(W, 4 * W),
                   p + "mlp.c_proj.bias": z(W)})
    params = convert_torch_clip_text(sd)
    model = ClipTextEncoder()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, C), jnp.int32)))["params"]
    got_shapes = jax.tree.map(lambda a: jnp.shape(a), params)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    assert got_shapes == ref_shapes


# ───────────────────────── LSeg converter ─────────────────────────

LSEG_CFG = dict(patch=8, width=64, depth=4, heads=1, taps=(0, 1, 2, 3),
                fusion_features=16, reassemble_dims=(16, 24, 32, 32),
                out_dim=8, image_size=32)


def _lseg_sd(rng):
    W = LSEG_CFG["width"]
    P = LSEG_CFG["patch"]
    F = LSEG_CFG["fusion_features"]
    rd = LSEG_CFG["reassemble_dims"]
    n_tok = 1 + (LSEG_CFG["image_size"] // P) ** 2
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    sd = {
        "pretrained.model.patch_embed.proj.weight": r(W, 3, P, P),
        "pretrained.model.patch_embed.proj.bias": r(W),
        "pretrained.model.cls_token": r(1, 1, W),
        "pretrained.model.pos_embed": r(1, n_tok, W),
        "scratch.head1.weight": r(LSEG_CFG["out_dim"], F, 1, 1),
        "scratch.head1.bias": r(LSEG_CFG["out_dim"]),
        "logit_scale": np.float32(np.log(1 / 0.07)),
    }
    for i in range(LSEG_CFG["depth"]):
        b = f"pretrained.model.blocks.{i}."
        sd.update({b + "attn.qkv.weight": r(3 * W, W),
                   b + "attn.qkv.bias": r(3 * W),
                   b + "attn.proj.weight": r(W, W),
                   b + "attn.proj.bias": r(W),
                   b + "norm1.weight": 1 + r(W), b + "norm1.bias": r(W),
                   b + "norm2.weight": 1 + r(W), b + "norm2.bias": r(W),
                   b + "mlp.fc1.weight": r(4 * W, W), b + "mlp.fc1.bias": r(4 * W),
                   b + "mlp.fc2.weight": r(W, 4 * W), b + "mlp.fc2.bias": r(W)})
    for t in range(4):
        ap = f"pretrained.act_postprocess{t + 1}."
        sd[ap + "0.project.0.weight"] = r(W, 2 * W)
        sd[ap + "0.project.0.bias"] = r(W)
        sd[ap + "3.weight"] = r(rd[t], W, 1, 1)
        sd[ap + "3.bias"] = r(rd[t])
        sd[f"scratch.layer{t + 1}_rn.weight"] = r(F, rd[t], 3, 3)
    sd["pretrained.act_postprocess4.4.weight"] = r(rd[3], rd[3], 3, 3)
    sd["pretrained.act_postprocess4.4.bias"] = r(rd[3])
    for t in range(4):
        rf = f"scratch.refinenet{t + 1}."
        if t != 3:  # deepest refinenet (→ fusion_3) has no skip path
            sd[rf + "resConfUnit1.conv1.weight"] = r(F, F, 3, 3)
            sd[rf + "resConfUnit1.conv1.bias"] = r(F)
            sd[rf + "resConfUnit1.conv2.weight"] = r(F, F, 3, 3)
            sd[rf + "resConfUnit1.conv2.bias"] = r(F)
        sd[rf + "resConfUnit2.conv1.weight"] = r(F, F, 3, 3)
        sd[rf + "resConfUnit2.conv1.bias"] = r(F)
        sd[rf + "resConfUnit2.conv2.weight"] = r(F, F, 3, 3)
        sd[rf + "resConfUnit2.conv2.bias"] = r(F)
        sd[rf + "out_conv.weight"] = r(F, F, 1, 1)
        sd[rf + "out_conv.bias"] = r(F)
    return sd


def _np_vit_block(sd, i, x):
    """Numpy oracle for one timm ViT block from the torch dict; x [T, W]."""
    b = f"pretrained.model.blocks.{i}."
    wq, wk, wv = np.split(sd[b + "attn.qkv.weight"], 3, axis=0)
    bq, bk, bv = np.split(sd[b + "attn.qkv.bias"], 3, axis=0)
    y = np_ln(x, sd[b + "norm1.weight"], sd[b + "norm1.bias"], 1e-6)
    x = x + np_mha(y, wq, bq, wk, bk, wv, bv, sd[b + "attn.proj.weight"],
                   sd[b + "attn.proj.bias"], LSEG_CFG["heads"])
    y = np_ln(x, sd[b + "norm2.weight"], sd[b + "norm2.bias"], 1e-6)
    y = np_gelu_exact(y @ sd[b + "mlp.fc1.weight"].T + sd[b + "mlp.fc1.bias"])
    return x + y @ sd[b + "mlp.fc2.weight"].T + sd[b + "mlp.fc2.bias"]


def test_convert_lseg_block_matches_numpy_oracle(rng):
    """Converted ViT block (QKV split/reshape, LN, exact GELU) vs oracle."""
    from segsplat_tpu.models.lseg import ViTBlock, convert_lseg_checkpoint

    sd = _lseg_sd(rng)
    params = convert_lseg_checkpoint(dict(sd))
    x = rng.standard_normal((1, 9, LSEG_CFG["width"])).astype(np.float32)
    blk = ViTBlock(dim=LSEG_CFG["width"], heads=LSEG_CFG["heads"])
    got = np.asarray(blk.apply({"params": params["block_0"]}, jnp.asarray(x)))
    want = _np_vit_block(sd, 0, x[0])[None]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_convert_lseg_patch_embed_conv_layout(rng):
    """OIHW→HWIO conv conversion: converted patch embed == numpy correlation."""
    from segsplat_tpu.models.lseg import convert_lseg_checkpoint

    sd = _lseg_sd(rng)
    params = convert_lseg_checkpoint(dict(sd))
    P, W = LSEG_CFG["patch"], LSEG_CFG["width"]
    img = rng.standard_normal((1, 2 * P, 2 * P, 3)).astype(np.float32)
    import flax.linen as nn
    conv = nn.Conv(W, (P, P), strides=(P, P), padding="VALID")
    got = np.asarray(conv.apply({"params": params["patch_embed"]},
                                jnp.asarray(img)))
    w_t = sd["pretrained.model.patch_embed.proj.weight"]       # [O, 3, P, P]
    want = np.zeros((1, 2, 2, W), np.float32)
    for i in range(2):
        for j in range(2):
            patch = img[0, i * P:(i + 1) * P, j * P:(j + 1) * P, :]  # [P,P,3]
            want[0, i, j] = (np.einsum("abc,ocab->o", patch, w_t)
                             + sd["pretrained.model.patch_embed.proj.bias"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convert_lseg_full_forward_and_logit_scale(rng):
    """Full tiny-config convert → LSegModel forward runs, is finite, and the
    logit scale rides along."""
    from segsplat_tpu.models.lseg import LSegModel, convert_lseg_checkpoint

    sd = _lseg_sd(rng)
    params = convert_lseg_checkpoint(sd)
    model = LSegModel(params=params, **LSEG_CFG)
    assert float(model.logit_scale) == pytest.approx(1 / 0.07, rel=1e-5)
    img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    # patch=8 → DPT head lands at full input res (the ViT-L/16 config lands at
    # H/2, which LSegModel.features upsamples back by 2×)
    feats = np.asarray(model.features(img, upsample=False))
    assert feats.shape == (1, 32, 32, LSEG_CFG["out_dim"])
    assert np.isfinite(feats).all()


def test_convert_lseg_vitl_config_shapes():
    """Shape round-trip at the real ViT-L/16 LSeg config (zeros-valued):
    converter output must structurally match LSegNet.init exactly."""
    from segsplat_tpu.models.lseg import LSegNet, convert_lseg_checkpoint

    W, depth, P, F = 1024, 24, 16, 256
    rd = (256, 512, 1024, 1024)
    n_tok = 1 + (384 // P) ** 2
    z = lambda *s: np.zeros(s, np.float32)
    sd = {"pretrained.model.patch_embed.proj.weight": z(W, 3, P, P),
          "pretrained.model.patch_embed.proj.bias": z(W),
          "pretrained.model.cls_token": z(1, 1, W),
          "pretrained.model.pos_embed": z(1, n_tok, W),
          "scratch.head1.weight": z(512, F, 1, 1),
          "scratch.head1.bias": z(512)}
    for i in range(depth):
        b = f"pretrained.model.blocks.{i}."
        sd.update({b + "attn.qkv.weight": z(3 * W, W), b + "attn.qkv.bias": z(3 * W),
                   b + "attn.proj.weight": z(W, W), b + "attn.proj.bias": z(W),
                   b + "norm1.weight": z(W), b + "norm1.bias": z(W),
                   b + "norm2.weight": z(W), b + "norm2.bias": z(W),
                   b + "mlp.fc1.weight": z(4 * W, W), b + "mlp.fc1.bias": z(4 * W),
                   b + "mlp.fc2.weight": z(W, 4 * W), b + "mlp.fc2.bias": z(W)})
    for t in range(4):
        ap = f"pretrained.act_postprocess{t + 1}."
        sd[ap + "0.project.0.weight"] = z(W, 2 * W)
        sd[ap + "0.project.0.bias"] = z(W)
        sd[ap + "3.weight"] = z(rd[t], W, 1, 1)
        sd[ap + "3.bias"] = z(rd[t])
        sd[f"scratch.layer{t + 1}_rn.weight"] = z(F, rd[t], 3, 3)
    sd["pretrained.act_postprocess4.4.weight"] = z(rd[3], rd[3], 3, 3)
    sd["pretrained.act_postprocess4.4.bias"] = z(rd[3])
    for t in range(4):
        rf = f"scratch.refinenet{t + 1}."
        if t != 3:
            for c in ("conv1", "conv2"):
                sd[rf + f"resConfUnit1.{c}.weight"] = z(F, F, 3, 3)
                sd[rf + f"resConfUnit1.{c}.bias"] = z(F)
        for c in ("conv1", "conv2"):
            sd[rf + f"resConfUnit2.{c}.weight"] = z(F, F, 3, 3)
            sd[rf + f"resConfUnit2.{c}.bias"] = z(F)
        sd[rf + "out_conv.weight"] = z(F, F, 1, 1)
        sd[rf + "out_conv.bias"] = z(F)

    params = convert_lseg_checkpoint(sd)
    net = LSegNet()
    ref = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))[
        "params"]
    got_shapes = jax.tree.map(lambda a: jnp.shape(a), params)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    assert got_shapes == ref_shapes


# ───────────────────────── real-BPE tokenizer branch ─────────────────────────

def test_clip_tokenizer_bpe_branch(tmp_path):
    """Exercise the REAL byte-level BPE (merge ranking, </w> handling, SOT/EOT
    framing) with a small synthetic merges table whose expected output is
    derivable by hand from the published BPE algorithm."""
    from segsplat_tpu.models.tokenizer import (CONTEXT_LENGTH, EOT, SOT,
                                               ClipTokenizer)

    merges = ["h e", "he l", "hel l", "hell o</w>", "w o", "wo w</w>"]
    bpe = tmp_path / "merges.txt.gz"
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("#version: synthetic\n" + "\n".join(merges) + "\n")
    tok = ClipTokenizer(str(bpe))

    # vocab layout: 256 bytes, 256 byte+</w>, then merges in rank order
    base = 512
    assert tok.encode("hello") == [base + 3]            # full merge chain
    assert tok.encode("wow") == [base + 5]
    # partial merge: "helz" → "hel" + "z</w>"
    hel = base + 1
    z_end = tok.encoder["z</w>"]
    assert tok.encode("helz") == [hel, z_end]
    # unknown word falls back to byte tokens with trailing </w>
    ids = tok.encode("xy")
    assert ids == [tok.encoder["x"], tok.encoder["y</w>"]]
    # framing/padding contract of clip.tokenize
    arr = tok(["hello wow"])
    assert arr.shape == (1, CONTEXT_LENGTH)
    assert arr[0, 0] == SOT
    assert list(arr[0, 1:3]) == [base + 3, base + 5]
    assert arr[0, 3] == EOT
    assert (arr[0, 4:] == 0).all()
    # case/whitespace normalization matches CLIP's basic_clean+lower
    assert tok.encode("  HeLLo ") == tok.encode("hello")
