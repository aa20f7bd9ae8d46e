"""LSeg-native text grounding (VERDICT round-1 item #6): the in-framework
replacement for the reference's GroundingDINO+SAM frame-0 query."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.make_goldens import hash_prompt_embeddings


def test_text_query_mask_selects_prompt_region():
    """Features aligned with the prompt embedding are selected; features
    aligned with a LERF negative are rejected."""
    from segsplat_tpu.pipeline.query import LERF_NEGATIVES, text_query_mask

    C, H, W = 32, 16, 16
    emb_p = hash_prompt_embeddings(["chair"], C)[0]
    emb_n = hash_prompt_embeddings([LERF_NEGATIVES[0]], C)[0]
    fmap = np.tile(emb_n, (H, W, 1)).astype(np.float32)
    fmap[:8] = emb_p
    mask = text_query_mask(fmap, "chair", threshold=0.5)
    assert mask.shape == (H, W)
    assert mask[:8].all()
    assert not mask[8:].any()


def test_text_query_mask_accepts_chw_layout():
    from segsplat_tpu.pipeline.query import text_query_mask

    C, H, W = 24, 10, 12
    rng = np.random.default_rng(0)
    f_hwc = rng.standard_normal((H, W, C)).astype(np.float32)
    m1 = text_query_mask(f_hwc, "table")
    m2 = text_query_mask(np.transpose(f_hwc, (2, 0, 1)), "table",
                         channels_first=True)
    np.testing.assert_array_equal(m1, m2)


def test_text_query_mask_with_real_clip_architecture():
    """Grounding through the REAL stack: byte-level BPE tokenizer → a
    torch-built CLIP text tower (tests/torch_oracles_nn.py) converted to
    Flax → pairwise-LERF relevancy → mask. Regions painted with the tower's
    OWN embedding for the prompt must be selected over regions painted with
    its embeddings of the LERF negatives — meaningful grounding semantics,
    not contrived feature vectors."""
    import jax.numpy as jnp

    from segsplat_tpu.models.clip_text import (ClipTextEncoder,
                                               convert_torch_clip_text)
    from segsplat_tpu.models.tokenizer import get_tokenizer
    from segsplat_tpu.pipeline.query import LERF_NEGATIVES, text_query_mask
    from tests.torch_oracles_nn import TorchClipText, seed_all, to_numpy_sd

    cfg = dict(width=64, layers=2, heads=2, embed_dim=32,
               vocab_size=49408, context_length=77)
    seed_all(3)
    tm = TorchClipText(**cfg)
    params = convert_torch_clip_text(to_numpy_sd(tm), heads=2)
    params.pop("__logit_scale__")
    enc = ClipTextEncoder(**cfg)
    tok = get_tokenizer()

    class Tower:
        def encode_prompts(self, prompts):
            emb = np.asarray(enc.apply(
                {"params": params},
                jnp.asarray(tok(list(prompts)), jnp.int32)))
            return emb / np.linalg.norm(emb, axis=1, keepdims=True)

    tower = Tower()
    emb = tower.encode_prompts(["chair", *LERF_NEGATIVES])
    C, H, W = emb.shape[1], 12, 16
    fmap = np.tile(emb[1], (H, W, 1)).astype(np.float32)   # negative bg
    fmap[:6] = emb[0]                                      # prompt region
    fmap[6:, 8:] = emb[2]                                  # another negative
    mask = text_query_mask(fmap, "chair", text_model=tower, threshold=0.5)
    assert mask[:6].all()
    assert not mask[6:].any()
