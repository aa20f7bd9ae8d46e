"""Pallas TPU kernel: per-tile alpha compositing of depth-sorted Gaussians.

This is the hot inner loop of the rasterizer (reference: the per-pixel
front-to-back blend loop of diff-gaussian-rasterization / gsplat's CUDA kernel,
consumed at gaussian_renderer/__init__.py:85-120 and
voxel_to_gaussian/render_semantics_logits.py:92-105).

Why a kernel: the pure-XLA formulation materializes [tiles, K, 256] alpha /
transmittance intermediates in HBM plus a multi-pass prefix product — measured
~180 ms/frame at 1080p. Here every intermediate lives in VMEM:

  * host side gathers ONE fused per-pair payload window [T, K, 8+CH]
    (mu, conic, opacity, colors — a single coalesced HBM gather; four separate
    gathers measured 10× slower than one fused gather),
  * grid = (tile_rows, tile_cols); Mosaic double-buffers each tile's window
    HBM→VMEM across grid steps,
  * per G-row block (VPU, [G, 256]):
      alpha[g, p] = clamp(op_g · exp(-sigma_gp))
      T[g, p]     = prod_{g'<g} (1 - alpha[g', p])   (log2(G) shifted multiplies,
                                                      exact — no exp/log roundtrip)
      img[p, :]  += (alpha·T)ᵀ @ colors               (MXU [256, G] @ [G, CH])
    with the running transmittance carried across blocks — the FlashAttention
    blocking trick applied to front-to-back compositing,
  * a per-block early-out skips remaining blocks once every pixel is saturated
    (transmittance < 1e-4), mirroring the CUDA kernel's per-pixel early
    termination at block granularity.

Matches ops/rasterize._blend_tiles bit-closely (same alpha clipping rules:
sigma ≥ 0, alpha ≥ 1/255, clamp 0.999); validated in tests/test_blend_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PX = TILE * TILE            # 256 pixels per tile
GEOM = 8                    # payload prefix: mux, muy, conic a/b/c, opacity, pad×2
PAYLOAD_WIDTH = 128         # payload rows padded to one lane tile (Mosaic DMA
                            # slices must be 128-aligned on the lane axis)

_SAT_EPS = 1e-4             # early-out when max transmittance drops below this


def _cumprod_rows(x: jax.Array) -> jax.Array:
    """Inclusive cumprod along axis 0 via log2(G) shifted multiplies — exact in
    linear space (no exp/log roundtrip through the VPU's approximate
    transcendentals), static shapes."""
    g = x.shape[0]
    shift = 1
    while shift < g:
        x = x * jnp.concatenate(
            [jnp.ones((shift, x.shape[1]), x.dtype), x[:-shift]], axis=0)
        shift *= 2
    return x


def _blend_tile_kernel_dma(offs_ref, payload_hbm, bg_ref, img_ref, alpha_ref,
                           buf, sems, *, k_max: int, ch: int, tx_n: int,
                           g_block: int, dma_block: int):
    """Variant that pulls each tile's contiguous depth-ordered payload run
    straight out of HBM (offsets prefetched), double-buffered across grid
    steps — no [T, K] window materialization at all.

    The window is DMA'd in dma_block-row pieces, and piece h > 0 is issued
    ONLY when the tile's run actually extends past h·dma_block rows. All
    issued pieces are awaited up front (NOT per block: the body's saturation
    early-exit could otherwise leave an issued DMA un-awaited, corrupting the
    semaphore for the slot's next reuse).

    MEASURED at bench scale (1080p / 200k / m=3 / K=256, v5e): demand-issued
    halves (dma_block=128) cost +2.2 ms/frame vs one full-window DMA — the
    kernel is compute-bound, the second conditional DMA's issue/await
    overhead exceeds the bytes it saves. Default is therefore
    dma_block = k_max (a single unconditional window copy); the demand path
    stays available for workloads with much sparser tiles."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * pl.num_programs(1) + j
    n_t = pl.num_programs(0) * pl.num_programs(1)
    n_piece = k_max // dma_block

    def dma_piece(slot, tt, h):
        start = offs_ref[tt] + h * dma_block
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(start, dma_block), :],
            buf.at[slot, pl.ds(h * dma_block, dma_block), :],
            sems.at[slot, h])

    def issue(slot, tt):
        cnt = offs_ref[tt + 1] - offs_ref[tt]
        for h in range(n_piece):
            @pl.when((h == 0) | (cnt > h * dma_block))
            def _():
                dma_piece(slot, tt, h).start()

    @pl.when(t == 0)
    def _():
        issue(0, 0)

    @pl.when(t + 1 < n_t)
    def _():
        issue((t + 1) % 2, t + 1)

    cnt_raw = offs_ref[t + 1] - offs_ref[t]
    for h in range(n_piece):
        @pl.when((h == 0) | (cnt_raw > h * dma_block))
        def _():
            dma_piece(t % 2, t, h).wait()

    count = jnp.minimum(cnt_raw, k_max)
    _blend_body(count, buf.at[t % 2], bg_ref, img_ref, alpha_ref,
                i=i, j=j, k_max=k_max, ch=ch, g_block=g_block)


def _blend_body(count, win_ref, bg_ref, img_ref, alpha_ref,
                *, i, j, k_max: int, ch: int, g_block: int):

    # pixel centers of this tile (+0.5, gsplat convention) in image coords
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (jnp.mod(pid, TILE) + j * TILE).astype(jnp.float32) + 0.5
    py = ((pid // TILE) + i * TILE).astype(jnp.float32) + 0.5

    n_blocks = k_max // g_block
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (g_block, PX), 0)

    def block(b, carry):
        acc, trans, done = carry

        def live(_):
            win = win_ref[pl.ds(b * g_block, g_block), :]         # [G, 8+CH]
            mu_x = win[:, 0:1]
            mu_y = win[:, 1:2]
            ca = win[:, 2:3]
            cb = win[:, 3:4]
            cc = win[:, 4:5]
            op = win[:, 5:6]
            col = win[:, GEOM:GEOM + ch]                          # [G, CH]

            dx = mu_x - px                                        # [G, PX]
            dy = mu_y - py
            sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
            alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))
            valid = ((sigma >= 0.0) & (alpha >= 1.0 / 255.0)
                     & (row_ids < count - b * g_block))
            alpha = jnp.where(valid, alpha, 0.0)

            cum = _cumprod_rows(1.0 - alpha)                      # [G, PX]
            cum_before = jnp.concatenate(
                [jnp.ones((1, PX), cum.dtype), cum[:-1]], axis=0)
            w = alpha * trans * cum_before                        # [G, PX]
            new_acc = acc + jax.lax.dot_general(
                w, col, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [PX, CH]
            new_trans = trans * cum[-1:, :]
            return new_acc, new_trans

        def skip(_):
            return acc, trans

        acc2, trans2 = jax.lax.cond(done, skip, live, None)
        done2 = done | ((b + 1) * g_block >= count)
        done2 = done2 | (jnp.max(trans2) < _SAT_EPS)
        return acc2, trans2, done2

    acc0 = jnp.zeros((PX, ch), jnp.float32)
    trans0 = jnp.ones((1, PX), jnp.float32)
    acc, trans, _ = jax.lax.fori_loop(
        0, n_blocks, block, (acc0, trans0, jnp.asarray(False)))

    img = acc + trans.reshape(PX, 1) * bg_ref[0:1, :]
    # per-tile list layout [T, PX, CH]: contiguous 32KB block writes. (Writing
    # (TILE,TILE,CH) blocks straight into image layout was measured 25 ms/frame
    # SLOWER — 2KB strided row writes — than this + the XLA transpose pass.)
    img_ref[0, :, :] = img
    alpha_ref[0, 0, :] = 1.0 - trans[0]


@functools.partial(jax.jit,
                   static_argnames=("tx_n", "ty_n", "k_max", "g_block",
                                    "dma_block"))
def blend_tiles_pallas_dma(offsets: jax.Array,   # [T+1] int32 run starts (pairs)
                           sorted_payload: jax.Array,  # [L(+K pad), 128] f32
                           bg: jax.Array,        # [CH]
                           tx_n: int, ty_n: int, k_max: int,
                           g_block: Optional[int] = None,
                           dma_block: Optional[int] = None):
    """Blend all tiles reading each tile's contiguous depth-ordered payload run
    directly from HBM (no per-tile window gather). ``sorted_payload`` must be
    padded with ≥ k_max rows past offsets[-1] and to PAYLOAD_WIDTH lanes; mu in
    IMAGE pixel coords. Returns (img [ty_n·16, tx_n·16, CH],
    alpha [ty_n·16, tx_n·16]) — written in image layout by the kernel."""
    T = tx_n * ty_n
    ch = bg.shape[-1]
    assert sorted_payload.shape[-1] == PAYLOAD_WIDTH, (
        f"payload rows must be padded to {PAYLOAD_WIDTH} lanes")
    # body block default 256: at K=256 the single 256-row block beat two
    # 128-row blocks by 1.3 ms/frame at bench scale (fewer early-exit cond
    # branches, deeper MXU contraction) — early exit only pays when a tile
    # saturates well before the window ends. k_max values that are multiples
    # of 128 but not 256 (e.g. 384) fall back to 128-row blocks.
    g_block = g_block or (256 if k_max % 256 == 0 else 128)
    assert k_max % g_block == 0, f"k_max must be a multiple of {g_block}"
    dma_block = dma_block or k_max          # default: one full-window DMA
    assert k_max % dma_block == 0, f"k_max must be a multiple of {dma_block}"

    kernel = functools.partial(_blend_tile_kernel_dma, k_max=k_max, ch=ch,
                               tx_n=tx_n, g_block=g_block,
                               dma_block=dma_block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty_n, tx_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                  # payload in HBM
            pl.BlockSpec((1, ch), lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, PX, ch), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PX), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, k_max, PAYLOAD_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2, k_max // dma_block)),
        ],
    )
    img, alpha = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, PX, ch), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, PX), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=T * k_max * PX * 2 * (ch + 10),
            bytes_accessed=T * k_max * (GEOM + ch) * 4 + T * PX * ch * 4,
            transcendentals=T * k_max * PX,
        ),
    )(offsets, sorted_payload, bg.reshape(1, ch))
    img = img.reshape(ty_n, tx_n, TILE, TILE, ch).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ty_n * TILE, tx_n * TILE, ch)
    alpha = alpha.reshape(ty_n, tx_n, TILE, TILE).transpose(0, 2, 1, 3)
    return img, alpha.reshape(ty_n * TILE, tx_n * TILE)
