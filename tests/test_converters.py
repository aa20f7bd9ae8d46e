"""Weight-converter tests against REAL torch-module oracles (VERDICT round-2
item #2): state dicts are produced by actual ``torch.nn`` models arranged in
the OpenAI-CLIP / timm-ViT+DPT graphs (tests/torch_oracles_nn.py), and the
converted Flax forwards must match the torch forwards — per block and
end-to-end — at fp32. No hand-written attention/conv math anywhere: head
packing, conv orientation, LN eps and GELU variant all come from torch itself.

Reference weight paths: script/extract_lseg_features.py:43-62 (demo_e200.ckpt),
voxel_to_gaussian/voxeltoGaussian_logits.py:162-199 (CLIP text embeddings).
"""

import gzip

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_oracles_nn import (TorchClipText, TorchLSeg, TimmViTBlock,
                                    lseg_checkpoint_dict, seed_all,
                                    to_numpy_sd)

CLIP_CFG = dict(width=64, layers=2, heads=2, embed_dim=32, vocab_size=50,
                context_length=12)
LSEG_CFG = dict(patch=8, width=64, depth=4, heads=2, taps=(0, 1, 2, 3),
                fusion_features=16, reassemble_dims=(16, 24, 32, 32),
                out_dim=8, image_size=32)


# ───────────────────────── CLIP text converter ─────────────────────────

def _clip_pair():
    seed_all(0)
    tm = TorchClipText(**CLIP_CFG).eval()
    return tm, to_numpy_sd(tm)


def _tokens():
    t = np.zeros((2, CLIP_CFG["context_length"]), np.int64)
    t[0, :5] = [48, 3, 7, 12, 49]
    t[1, :4] = [48, 30, 2, 49]
    return t


def test_convert_clip_text_matches_torch_end_to_end():
    from segsplat_tpu.models.clip_text import (ClipTextEncoder,
                                               convert_torch_clip_text)

    tm, sd = _clip_pair()
    params = convert_torch_clip_text(sd, heads=CLIP_CFG["heads"])
    assert float(params.pop("__logit_scale__")) == pytest.approx(1 / 0.07,
                                                                 rel=1e-5)
    tokens = _tokens()
    want = tm(torch.from_numpy(tokens)).numpy()
    model = ClipTextEncoder(**{k: v for k, v in CLIP_CFG.items()})
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_clip_resblock_matches_torch():
    """One converted residual attention block vs the torch block directly
    (causal-masked nn.MultiheadAttention + QuickGELU MLP)."""
    from segsplat_tpu.models.clip_text import (ResidualAttentionBlock,
                                               convert_torch_clip_text)
    import flax.linen as nn

    tm, sd = _clip_pair()
    params = convert_torch_clip_text(sd, heads=CLIP_CFG["heads"])
    T, W = 7, CLIP_CFG["width"]
    x = np.random.default_rng(1).standard_normal((1, T, W)).astype(np.float32)

    blk = tm.transformer.resblocks[0]
    mask = torch.full((T, T), float("-inf")).triu(1)
    with torch.no_grad():
        want = blk(torch.from_numpy(x).permute(1, 0, 2),
                   mask).permute(1, 0, 2).numpy()

    fblk = ResidualAttentionBlock(W, CLIP_CFG["heads"])
    causal = nn.make_causal_mask(jnp.zeros((1, T)))
    got = np.asarray(fblk.apply({"params": params["resblock_0"]},
                                jnp.asarray(x), causal))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_clip_from_torch_saved_ckpt(tmp_path):
    """Load path over a torch.save'd lightning-style .ckpt with nested
    net.clip_pretrained.* prefixes — the namespace demo_e200.ckpt uses."""
    from segsplat_tpu.models.clip_text import (ClipTextEncoder,
                                               convert_torch_clip_text)

    tm, _ = _clip_pair()
    ckpt = {"state_dict": {"net.clip_pretrained." + k: v
                           for k, v in tm.state_dict().items()}}
    path = str(tmp_path / "demo.ckpt")
    torch.save(ckpt, path)

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    sd = loaded.get("state_dict", loaded)
    params = convert_torch_clip_text({k: v.numpy() for k, v in sd.items()},
                                     heads=CLIP_CFG["heads"])
    params.pop("__logit_scale__")
    tokens = _tokens()
    want = tm(torch.from_numpy(tokens)).numpy()
    got = np.asarray(ClipTextEncoder(**CLIP_CFG).apply(
        {"params": params}, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_clip_full_config_shapes():
    """Structure round-trip at the real CLIP text config (49408 vocab, width
    512, 12 layers, 8 heads) — torch modules, zero-initialized for speed."""
    from segsplat_tpu.models.clip_text import (ClipTextEncoder,
                                               convert_torch_clip_text)

    cfg = dict(width=512, layers=12, heads=8, embed_dim=512,
               vocab_size=49408, context_length=77)
    with torch.no_grad():
        tm = TorchClipText(**cfg)
    params = convert_torch_clip_text(to_numpy_sd(tm))
    params.pop("__logit_scale__")
    model = ClipTextEncoder()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 77), jnp.int32)))["params"]
    got_shapes = jax.tree.map(lambda a: jnp.shape(a), params)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    assert got_shapes == ref_shapes


# ───────────────────────── LSeg converter ─────────────────────────

def _lseg_pair():
    seed_all(1)
    tm = TorchLSeg(**LSEG_CFG).eval()
    return tm, lseg_checkpoint_dict(tm)


def test_convert_lseg_vit_block_matches_torch():
    """Converted timm ViT block (fused-qkv split, LN eps 1e-6, exact GELU) vs
    the torch block."""
    from segsplat_tpu.models.lseg import ViTBlock, convert_lseg_checkpoint

    tm, sd = _lseg_pair()
    params = convert_lseg_checkpoint(dict(sd), heads=LSEG_CFG["heads"])
    x = np.random.default_rng(2).standard_normal(
        (1, 9, LSEG_CFG["width"])).astype(np.float32)
    blk = tm.pretrained.model.blocks[0]
    assert isinstance(blk, TimmViTBlock)
    with torch.no_grad():
        want = blk(torch.from_numpy(x)).numpy()
    fblk = ViTBlock(dim=LSEG_CFG["width"], heads=LSEG_CFG["heads"])
    got = np.asarray(fblk.apply({"params": params["block_0"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_lseg_patch_embed_matches_torch_conv():
    """OIHW→HWIO patch-embed conversion vs torch nn.Conv2d itself."""
    from segsplat_tpu.models.lseg import convert_lseg_checkpoint
    import flax.linen as fnn

    tm, sd = _lseg_pair()
    params = convert_lseg_checkpoint(dict(sd), heads=LSEG_CFG["heads"])
    P, W = LSEG_CFG["patch"], LSEG_CFG["width"]
    img = np.random.default_rng(3).standard_normal(
        (1, 2 * P, 2 * P, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.pretrained.model.patch_embed.proj(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1)
    conv = fnn.Conv(W, (P, P), strides=(P, P), padding="VALID")
    got = np.asarray(conv.apply({"params": params["patch_embed"]},
                                jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_lseg_full_forward_matches_torch():
    """END-TO-END: converted LSegNet forward (ViT backbone, project readout,
    reassemble with LEARNED deconv upsamplers, RefineNet fusion with
    align_corners=True resizes, 1×1 head) == the torch DPT graph, fp32."""
    from segsplat_tpu.models.lseg import LSegModel, convert_lseg_checkpoint

    tm, sd = _lseg_pair()
    params = convert_lseg_checkpoint(dict(sd), heads=LSEG_CFG["heads"])
    assert float(params["__logit_scale__"]) == pytest.approx(1 / 0.07,
                                                             rel=1e-5)
    model = LSegModel(params=params, **LSEG_CFG)
    img = np.random.default_rng(4).random((1, 32, 32, 3)).astype(np.float32)
    want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1)                     # [1, H/2, W/2, C]
    got = np.asarray(model.features(jnp.asarray(img), upsample=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convert_lseg_from_torch_saved_ckpt(tmp_path):
    """demo_e200.ckpt-shaped file: torch.save'd {'state_dict': {'net.'+k}}
    round-trips through the extract_lseg_features load path bit-equal to
    converting the in-memory dict."""
    from segsplat_tpu.models.lseg import convert_lseg_checkpoint

    tm, sd = _lseg_pair()
    ckpt = {"state_dict": {"net." + k: torch.from_numpy(v.copy())
                           for k, v in sd.items()}}
    path = str(tmp_path / "demo_e200.ckpt")
    torch.save(ckpt, path)

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    lsd = loaded.get("state_dict", loaded)
    p_file = convert_lseg_checkpoint(
        {k: v.numpy() for k, v in lsd.items() if hasattr(v, "numpy")},
        heads=LSEG_CFG["heads"])
    p_mem = convert_lseg_checkpoint(dict(sd), heads=LSEG_CFG["heads"])
    flat_f = jax.tree_util.tree_leaves_with_path(p_file)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(p_mem))
    assert len(flat_f) == len(flat_m)
    for k, v in flat_f:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_m[k]))


def test_convert_lseg_vitl_config_shapes():
    """Structure round-trip at the real ViT-L/16 LSeg config — the torch graph
    itself at full size (zero-init), not a hand-built key list."""
    from segsplat_tpu.models.lseg import LSegNet, convert_lseg_checkpoint

    cfg = dict(patch=16, width=1024, depth=24, heads=16, taps=(5, 11, 17, 23),
               fusion_features=256, reassemble_dims=(256, 512, 1024, 1024),
               out_dim=512, image_size=384)
    with torch.no_grad():
        tm = TorchLSeg(**cfg)
    params = convert_lseg_checkpoint(lseg_checkpoint_dict(tm))
    params.pop("__logit_scale__")
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


def test_word_split_matches_clip_regex():
    """The stdlib transcription of CLIP's pre-split regex must agree with the
    GENUINE pattern (openai/CLIP simple_tokenizer.py, run via the `regex`
    module that ships as a transformers dependency) — contractions split off,
    digit runs one-per-token, punctuation runs grouped. A glued isalnum
    walker here previously produced different token ids than clip.tokenize."""
    import pytest
    regex = pytest.importorskip("regex")

    from segsplat_tpu.models.tokenizer import _basic_clean, _word_split

    pat = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
        r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
    cases = [
        "it's a 25cm chair", "hello, world!!", "semi-transparent vase (blue)",
        "a_b__c", "don't won't it'll we're i'm you've he'd", "3dgs @ 1080p",
        "ünïcödé tëst", "price: $1,234.56", "  HeLLo   WOW  ", "a" * 80, "",
        "<|startoftext|>chair<|endoftext|>",
        # non-decimal numerics (\p{N} = Nd ∪ Nl ∪ No): previously classified
        # as letters and glued into runs
        "½ cup", "chapter Ⅻ section ⅻ", "x² + y³", "a½b 〡〢", "①②③",
        "\U00010107 aegean one",
    ]
    for t in cases:
        t = _basic_clean(t)
        assert _word_split(t) == pat.findall(t), t
    # the load-bearing example: digits one-per-token, contraction split
    assert _word_split("it's a 25cm chair") == \
        ["it", "'s", "a", "2", "5", "cm", "chair"]
    # Nl/No numerics split one-per-token and never merge into letter runs
    assert _word_split("a½b ⅻ²") == ["a", "½", "b", "ⅻ", "²"]


def test_word_split_matches_clip_regex_fuzz():
    """Differential fuzz vs the genuine \\p-class pattern over a mixed
    alphabet (letters, Nd/Nl/No numerics incl. astral plane, marks,
    punctuation, contraction suffixes)."""
    import random

    import pytest
    regex = pytest.importorskip("regex")

    from segsplat_tpu.models.tokenizer import _word_split

    pat = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
        r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
    alpha = "abc xyz 012½¾ⅫⅯ²³〇一_.,!'s't| \t①é中\U00010107̈"
    rnd = random.Random(0)
    for _ in range(3000):
        s = "".join(rnd.choice(alpha)
                    for _ in range(rnd.randint(1, 30))).lower()
        assert _word_split(s) == pat.findall(s), repr(s)
