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
