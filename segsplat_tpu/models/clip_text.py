"""CLIP text encoder in Flax — the text tower behind LSeg's open-vocabulary head.

LSeg scores 512-D pixel/voxel features against CLIP ViT-B/32 text embeddings
(reference call path: voxeltoGaussian_logits.py:189-199 →
lang-seg ``project_features_to_labels``; the text model is the public CLIP
architecture: 12-layer width-512 causal transformer, context 77, final LN, 512-D
text projection, learned logit scale).

Weights load from a converted OpenAI/HF CLIP checkpoint via
``convert_torch_clip_text``; without weights the module runs randomly initialized
(deterministic seed) so the full pipeline remains executable offline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segsplat_tpu.models.tokenizer import CONTEXT_LENGTH, VOCAB_SIZE


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width, name="attn",
            deterministic=True)(y, y, mask=mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(self.width * 4, name="mlp_fc")(y)
        y = QuickGELU()(y)
        y = nn.Dense(self.width, name="mlp_proj")(y)
        return x + y


class ClipTextEncoder(nn.Module):
    """Causal text transformer → normalized embedding per prompt."""

    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens [P, 77] int32 → [P, embed_dim] (unnormalized) text features."""
        tok_emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (self.context_length, self.width))
        x = tok_emb + pos_emb[None, : tokens.shape[1]]
        causal = nn.make_causal_mask(tokens)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # features at the EOT token (highest token id position, CLIP convention)
        eot = jnp.argmax(tokens, axis=1)
        x = x[jnp.arange(tokens.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        return x @ proj


class TextTower:
    """Convenience wrapper: tokenizer + encoder + logit scale."""

    def __init__(self, params: Optional[Dict[str, Any]] = None,
                 config: Optional[dict] = None, seed: int = 0):
        self.model = ClipTextEncoder(**(config or {}))
        self.random_init = params is None   # no converted weights: embeddings
        #                                     are NOT semantically meaningful
        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, CONTEXT_LENGTH), jnp.int32)
            params = self.model.init(rng, dummy)["params"]
            self.logit_scale = jnp.asarray(np.exp(np.log(1 / 0.07)), jnp.float32)
        else:
            self.logit_scale = jnp.asarray(
                params.get("__logit_scale__", np.exp(np.log(1 / 0.07))))
            # keep the caller's dict intact (a second tower from the same
            # converted checkpoint must still see the scale)
            params = {k: v for k, v in params.items()
                      if k != "__logit_scale__"}
        self.params = params
        self._encode = jax.jit(lambda p, t: self.model.apply({"params": p}, t))

    def encode(self, tokens: np.ndarray) -> jax.Array:
        """[P,77] → [P,D] L2-normalized text embeddings."""
        emb = self._encode(self.params, jnp.asarray(tokens))
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)

    def encode_prompts(self, prompts, tokenizer=None) -> np.ndarray:
        """Prompt strings → [P,D] normalized embeddings (tokenize + encode)
        — the interface pipeline/query's ``text_model`` expects."""
        if tokenizer is None:
            from segsplat_tpu.models.tokenizer import get_tokenizer
            tokenizer = get_tokenizer()
        return np.asarray(self.encode(tokenizer(list(prompts))))


def project_features_to_labels(features: jax.Array, text_emb: jax.Array,
                               logit_scale) -> jax.Array:
    """Open-vocab scoring head: logits = s · norm(feat) @ norm(text)ᵀ.

    The LSeg head the reference calls per 10k-voxel batch
    (voxeltoGaussian_logits.py:189-199). features [N, 512] (any leading shape),
    text_emb [P, 512] pre-normalized. One MXU matmul for the whole table.
    """
    f = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
    return logit_scale * (f @ text_emb.T)


def convert_torch_clip_text(state_dict, heads: Optional[int] = None) -> Dict[str, Any]:
    """Map an OpenAI CLIP (or LSeg ``clip_pretrained``-prefixed) torch state dict
    onto ClipTextEncoder param pytree. Accepts numpy-valued dicts. ``heads``
    defaults to width//64 (correct for every published CLIP text config)."""
    sd = {}
    for k, v in state_dict.items():
        # strip LEADING wrapper prefixes only (LSeg lightning nests the text
        # tower as net.clip_pretrained.*; DDP adds module.)
        for pre in ("module.", "net.", "clip_pretrained."):
            while k.startswith(pre):
                k = k[len(pre):]
        sd[k] = np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
    width = sd["ln_final.weight"].shape[0]
    n_layers = max(int(k.split(".")[2]) for k in sd
                   if k.startswith("transformer.resblocks.")) + 1
    heads = heads or width // 64

    p: Dict[str, Any] = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    for i in range(n_layers):
        pre = f"transformer.resblocks.{i}."
        wqkv = sd[pre + "attn.in_proj_weight"]      # [3W, W]
        bqkv = sd[pre + "attn.in_proj_bias"]
        wq, wk, wv = np.split(wqkv, 3, axis=0)
        bq, bk, bv = np.split(bqkv, 3, axis=0)
        hd = width // heads

        def as_flax_in(w, b):
            # torch [out, in] → flax MHA kernel [in, heads, head_dim]
            return {"kernel": w.T.reshape(width, heads, hd),
                    "bias": b.reshape(heads, hd)}

        wo = sd[pre + "attn.out_proj.weight"]
        bo = sd[pre + "attn.out_proj.bias"]
        p[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[pre + "ln_1.weight"], "bias": sd[pre + "ln_1.bias"]},
            "ln_2": {"scale": sd[pre + "ln_2.weight"], "bias": sd[pre + "ln_2.bias"]},
            "attn": {
                "query": as_flax_in(wq, bq),
                "key": as_flax_in(wk, bk),
                "value": as_flax_in(wv, bv),
                "out": {"kernel": wo.T.reshape(heads, hd, width), "bias": bo},
            },
            "mlp_fc": {"kernel": sd[pre + "mlp.c_fc.weight"].T,
                       "bias": sd[pre + "mlp.c_fc.bias"]},
            "mlp_proj": {"kernel": sd[pre + "mlp.c_proj.weight"].T,
                         "bias": sd[pre + "mlp.c_proj.bias"]},
        }
    if "logit_scale" in sd:
        p["__logit_scale__"] = jnp.asarray(np.exp(sd["logit_scale"]))
    return p
