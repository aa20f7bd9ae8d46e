"""Torch-module oracles for the weight converters (VERDICT round-2 item #2).

These rebuild the OpenAI-CLIP text tower and the timm-ViT + DPT (LSeg) graphs
from REAL ``torch.nn`` modules — ``nn.MultiheadAttention``, ``nn.LayerNorm``,
``nn.Conv2d``, ``nn.ConvTranspose2d``, ``F.interpolate`` — so converter tests
compare the Flax forward against actual torch semantics (attention head
packing, conv orientation, LN eps, GELU variant) rather than a hand-written
numpy transcription of them. Module attribute names are chosen so that
``state_dict()`` emits the public checkpoint namespaces directly
(``transformer.resblocks.{i}.attn.in_proj_weight`` for CLIP;
``pretrained.model.blocks.{i}`` / ``scratch.refinenet{j}`` for LSeg, with a
small in_proj→qkv key rename for the timm convention).

Checkpoint consumers being validated:
  reference script/extract_lseg_features.py:43-62 (demo_e200.ckpt → LSegNet),
  voxel_to_gaussian/voxeltoGaussian_logits.py:162-199 (CLIP text embeddings).
"""

from __future__ import annotations

import math
from collections import OrderedDict

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def seed_all(seed: int = 0):
    torch.manual_seed(seed)


def to_numpy_sd(model: nn.Module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


# ───────────────────────── CLIP text tower ─────────────────────────

class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ClipResBlock(nn.Module):
    def __init__(self, width: int, heads: int):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(width, 4 * width)),
            ("gelu", QuickGELU()),
            ("c_proj", nn.Linear(4 * width, width)),
        ]))
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x, attn_mask):   # x [T, B, W]
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchClipText(nn.Module):
    """The OpenAI CLIP text transformer (public architecture), real torch.nn."""

    def __init__(self, width=64, layers=2, heads=1, embed_dim=32,
                 vocab_size=50, context_length=12):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab_size, width)
        self.positional_embedding = nn.Parameter(
            torch.randn(context_length, width) * 0.1)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [ClipResBlock(width, heads) for _ in range(layers)])
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.randn(width, embed_dim) * 0.1)
        self.logit_scale = nn.Parameter(
            torch.tensor(float(math.log(1 / 0.07))))

    @torch.no_grad()
    def forward(self, tokens):   # [B, T] int64 → [B, embed_dim]
        T = tokens.shape[1]
        x = self.token_embedding(tokens) + self.positional_embedding[:T]
        x = x.permute(1, 0, 2)                       # [T, B, W] (CLIP LND)
        mask = torch.full((T, T), float("-inf")).triu(1)
        for blk in self.transformer.resblocks:
            x = blk(x, mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = tokens.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection


# ───────────────────────── timm ViT + DPT (LSeg) ─────────────────────────

class TimmViTBlock(nn.Module):
    """timm ViT encoder block; attention via nn.MultiheadAttention (identical
    qkv packing to timm's fused Linear), LN eps 1e-6, exact GELU."""

    def __init__(self, width: int, heads: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(width, eps=1e-6)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.norm2 = nn.LayerNorm(width, eps=1e-6)
        self.mlp = nn.Sequential(OrderedDict([
            ("fc1", nn.Linear(width, 4 * width)),
            ("act", nn.GELU()),
            ("fc2", nn.Linear(4 * width, width)),
        ]))

    def forward(self, x):      # [B, T, W]
        y = self.norm1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        return x + self.mlp(self.norm2(x))


class ProjectReadout(nn.Module):
    """DPT 'project' readout: concat each patch token with the cls token,
    Linear(2W→W) + GELU."""

    def __init__(self, width: int):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * width, width), nn.GELU())

    def forward(self, x):      # [B, 1+N, W] → [B, N, W]
        readout = x[:, 0:1].expand_as(x[:, 1:])
        return self.project(torch.cat((x[:, 1:], readout), -1))


class Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


class ResidualConvUnit(nn.Module):
    def __init__(self, features: int):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class FeatureFusionBlock(nn.Module):
    """DPT FeatureFusionBlock_custom: optional skip RCU, main RCU, ×2 bilinear
    align_corners=True upsample, 1×1 out conv."""

    def __init__(self, features: int, with_skip: bool):
        super().__init__()
        if with_skip:
            self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class TorchLSeg(nn.Module):
    """timm ViT backbone + DPT decode head + LSeg 512-D head, real torch.nn,
    with the demo_e200.ckpt attribute namespace (pretrained.model.*,
    pretrained.act_postprocess{1..4}, scratch.*)."""

    def __init__(self, patch=8, width=64, depth=4, heads=1, taps=(0, 1, 2, 3),
                 fusion_features=16, reassemble_dims=(16, 24, 32, 32),
                 out_dim=8, image_size=32):
        super().__init__()
        self.patch, self.taps, self.grid = patch, tuple(taps), image_size // patch
        rd = list(reassemble_dims)
        ff = fusion_features
        n_tok = 1 + self.grid ** 2

        self.pretrained = nn.Module()
        model = nn.Module()
        model.patch_embed = nn.Module()
        model.patch_embed.proj = nn.Conv2d(3, width, patch, stride=patch)
        model.cls_token = nn.Parameter(torch.randn(1, 1, width) * 0.1)
        model.pos_embed = nn.Parameter(torch.randn(1, n_tok, width) * 0.1)
        model.blocks = nn.ModuleList(
            [TimmViTBlock(width, heads) for _ in range(depth)])
        self.pretrained.model = model

        for t in range(4):
            layers = [ProjectReadout(width), Transpose(),
                      nn.Unflatten(2, (self.grid, self.grid)),
                      nn.Conv2d(width, rd[t], 1)]
            if t == 0:
                layers.append(nn.ConvTranspose2d(rd[0], rd[0], 4, stride=4))
            elif t == 1:
                layers.append(nn.ConvTranspose2d(rd[1], rd[1], 2, stride=2))
            elif t == 3:
                layers.append(nn.Conv2d(rd[3], rd[3], 3, stride=2, padding=1))
            setattr(self.pretrained, f"act_postprocess{t + 1}",
                    nn.Sequential(*layers))

        self.scratch = nn.Module()
        for t in range(4):
            setattr(self.scratch, f"layer{t + 1}_rn",
                    nn.Conv2d(rd[t], ff, 3, padding=1, bias=False))
            setattr(self.scratch, f"refinenet{t + 1}",
                    FeatureFusionBlock(ff, with_skip=(t != 3)))
        self.scratch.head1 = nn.Conv2d(ff, out_dim, 1)
        self.logit_scale = nn.Parameter(
            torch.tensor(float(math.log(1 / 0.07))))

    def backbone_tokens(self, img_norm):
        """img_norm [B,3,H,W] already normalized → list of tapped [B,1+N,W]."""
        x = self.pretrained.model.patch_embed.proj(img_norm)
        x = x.flatten(2).transpose(1, 2)                     # [B, N, W]
        cls = self.pretrained.model.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1) + self.pretrained.model.pos_embed
        tapped = []
        for i, blk in enumerate(self.pretrained.model.blocks):
            x = blk(x)
            if i in self.taps:
                tapped.append(x)
        return tapped

    @torch.no_grad()
    def forward(self, images, mean=(0.485, 0.456, 0.406),
                std=(0.229, 0.224, 0.225)):
        """images [B,3,H,W] raw [0,1] → [B,out_dim,H/2,W/2] (pre-logit LSeg
        image features; normalization folded in to mirror the reference's
        external transform, extract_lseg_features.py:69)."""
        m = torch.tensor(mean).view(1, 3, 1, 1)
        s = torch.tensor(std).view(1, 3, 1, 1)
        tapped = self.backbone_tokens((images - m) / s)
        layers = [getattr(self.pretrained, f"act_postprocess{t + 1}")(tok)
                  for t, tok in enumerate(tapped)]
        rns = [getattr(self.scratch, f"layer{t + 1}_rn")(l)
               for t, l in enumerate(layers)]
        path = self.scratch.refinenet4(rns[3])
        path = self.scratch.refinenet3(path, rns[2])
        path = self.scratch.refinenet2(path, rns[1])
        path = self.scratch.refinenet1(path, rns[0])
        return self.scratch.head1(path)


def lseg_checkpoint_dict(model: TorchLSeg) -> dict:
    """state_dict → the demo_e200.ckpt key namespace (numpy-valued). The only
    rename needed is nn.MultiheadAttention's in_proj/out_proj → timm's fused
    qkv/proj naming (identical [3W,W] q|k|v row packing in both)."""
    out = {}
    for k, v in to_numpy_sd(model).items():
        k = (k.replace("attn.in_proj_weight", "attn.qkv.weight")
              .replace("attn.in_proj_bias", "attn.qkv.bias")
              .replace("attn.out_proj.", "attn.proj."))
        out[k] = v
    return out
