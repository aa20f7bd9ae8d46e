"""Differentiable Pallas blend: custom VJP with an analytic backward kernel.

Training renders through XLA autodiff of the dense blend cost ~445 ms/step at
officescene scale — the backward materializes the same [tiles, K, 256]
intermediates as the forward, twice. This module wraps the forward DMA kernel
(ops/blend_pallas.py) in a jax.custom_vjp whose backward is a second Pallas
kernel using the classic compositing-gradient identity (the same formulation as
diff-gaussian-rasterization's backward, reorganized front-to-back):

    img      = Σ_k w_k c_k + T_fin·bg,   w_k = α_k·T^before_k
    ∂img/∂α_k = T^before_k c_k − (C_rest_k + T_fin·bg) / (1 − α_k)
    C_rest_k  = C_total − prefix_k   (suffix color sums via running prefix —
                                      ONE forward sweep, no back-to-front pass)

Residuals are just the forward OUTPUTS (img gives C_total, alpha gives T_fin);
alphas are recomputed blockwise from the payload, so backward memory stays at
one VMEM block like the forward. Per-pair payload gradients are DMA'd back into
a sorted-pair-layout array; pair→Gaussian reduction happens in XLA via the
gather transpose (segment-add), and projection/color chain rules via ordinary
autodiff outside the kernel.

Gradient caveats (all shared with the CUDA reference): the binning structure
(which Gaussians land in which tile, depth order, the K cap) is
piecewise-constant and carries no gradient; pairs beyond the per-tile K cap
contribute zero gradient. Additionally, the FORWARD skips whole blocks once
a tile's max transmittance drops below _SAT_EPS (1e-4) while the backward
recomputes all blocks: pairs behind a saturated block receive the gradient
of the exact (no-early-exit) compositing rather than exactly zero — a
|T|≤1e-4-bounded forward/backward inconsistency, arguably closer to the
true math gradient than zeroing would be.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segsplat_tpu.ops.blend_pallas import (GEOM, PAYLOAD_WIDTH, PX, TILE,
                                           _cumprod_rows, blend_tiles_pallas_dma)


def _cumsum_rows(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis 0 via log2(G) shifted adds."""
    g = x.shape[0]
    shift = 1
    while shift < g:
        x = x + jnp.concatenate(
            [jnp.zeros((shift, x.shape[1]), x.dtype), x[:-shift]], axis=0)
        shift *= 2
    return x


def _bwd_kernel(offs_ref, payload_hbm, bg_ref, gimg_ref, galpha_ref,
                img_ref, aout_ref, dpay_init_ref, dpay_hbm, dbg_ref,
                buf, dbuf, sems, wsem,
                *, k_max: int, ch: int, tx_n: int, g_block: int):
    del dpay_init_ref  # aliased with dpay_hbm (zero-initialized HBM buffer)
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * pl.num_programs(1) + j
    n_t = pl.num_programs(0) * pl.num_programs(1)

    def dma_in(slot, tt):
        start = offs_ref[tt]
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(start, k_max), :], buf.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma_in(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        dma_in((t + 1) % 2, t + 1).start()

    dma_in(t % 2, t).wait()
    win_ref = buf.at[t % 2]

    start = offs_ref[t]
    count = jnp.minimum(offs_ref[t + 1] - start, k_max)

    pid = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (jnp.mod(pid, TILE) + j * TILE).astype(jnp.float32) + 0.5
    py = ((pid // TILE) + i * TILE).astype(jnp.float32) + 0.5

    g_img = gimg_ref[0, :, :]                                # [PX, ch]
    g_alpha = galpha_ref[0, 0:1, :]                          # [1, PX]
    img = img_ref[0, :, :]                                   # [PX, ch]
    t_fin = 1.0 - aout_ref[0, 0:1, :]                        # [1, PX]
    bg = bg_ref[0:1, :]                                      # [1, ch]

    # per-pixel scalars, computed as MXU contractions that produce [1, PX]
    # lane-layout results directly — a lane-axis jnp.sum followed by the
    # [PX]→[1,PX] relayout costs ~86 µs/tile in Mosaic (sublane↔lane transpose)
    # and dominated the whole backward (193 ms → 20 ms for the kernel)
    ones_ch = jnp.ones((1, ch), jnp.float32)
    g_bg = jax.lax.dot_general(                              # ⟨g, bg⟩ [1, PX]
        bg, g_img, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g_dot_img = jax.lax.dot_general(                         # ⟨g, img⟩ [1, PX]
        ones_ch, g_img * img, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g_c_tot = g_dot_img - t_fin * g_bg                       # ⟨g, ΣwC⟩ [1, PX]
    # the α-independent part of the 1/(1-α) term
    g_suffix_const = t_fin * g_bg - g_alpha * t_fin          # [1, PX]

    n_blocks = k_max // g_block
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (g_block, PX), 0)

    def block(b, carry):
        trans, gpref = carry
        win = win_ref[pl.ds(b * g_block, g_block), :]        # [G, 128]
        mu_x = win[:, 0:1]
        mu_y = win[:, 1:2]
        ca = win[:, 2:3]
        cb = win[:, 3:4]
        cc = win[:, 4:5]
        op = win[:, 5:6]
        col = win[:, GEOM:GEOM + ch]                         # [G, ch]

        dx = mu_x - px                                       # [G, PX]
        dy = mu_y - py
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        expnegs = jnp.exp(-sigma)
        raw = op * expnegs
        alpha = jnp.minimum(0.999, raw)
        valid = ((sigma >= 0.0) & (alpha >= 1.0 / 255.0)
                 & (row_ids < count - b * g_block))
        alpha = jnp.where(valid, alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = _cumprod_rows(one_minus)
        cum_before = jnp.concatenate(
            [jnp.ones((1, PX), cum.dtype), cum[:-1]], axis=0)
        t_before = trans * cum_before                        # [G, PX]
        w = alpha * t_before

        gc = jax.lax.dot_general(                            # ⟨g, c_k⟩ [G, PX]
            col, g_img, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        contrib = w * gc
        pref_in = _cumsum_rows(contrib)                      # inclusive [G, PX]
        gpref_k = gpref + pref_in
        g_c_rest = g_c_tot - gpref_k                         # ⟨g, Σ_{j>k} w c⟩

        dalpha = (t_before * gc
                  - (g_c_rest + g_suffix_const) / one_minus)  # [G, PX]
        # chain through the clamp + masks: grads flow only where alpha came
        # from op·exp(-σ) unclamped
        live = valid & (raw < 0.999)
        draw = jnp.where(live, dalpha, 0.0)

        d_op = jnp.sum(draw * expnegs, axis=1, keepdims=True)      # [G, 1]
        dsig = -draw * raw                                         # [G, PX]
        d_ca = 0.5 * jnp.sum(dsig * dx * dx, axis=1, keepdims=True)
        d_cb = jnp.sum(dsig * dx * dy, axis=1, keepdims=True)
        d_cc = 0.5 * jnp.sum(dsig * dy * dy, axis=1, keepdims=True)
        d_mux = jnp.sum(dsig * (ca * dx + cb * dy), axis=1, keepdims=True)
        d_muy = jnp.sum(dsig * (cc * dy + cb * dx), axis=1, keepdims=True)
        d_col = jax.lax.dot_general(                               # [G, ch]
            w, g_img, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        zeros_pad = jnp.zeros((g_block, GEOM - 6), jnp.float32)
        zeros_tail = jnp.zeros((g_block, PAYLOAD_WIDTH - GEOM - ch), jnp.float32)
        drow = jnp.concatenate(
            [d_mux, d_muy, d_ca, d_cb, d_cc, d_op, zeros_pad, d_col,
             zeros_tail], axis=1)                                  # [G, 128]
        dbuf[pl.ds(b * g_block, g_block), :] = drow

        new_trans = trans * cum[-1:, :]
        new_gpref = gpref + pref_in[-1:, :]
        return new_trans, new_gpref

    trans0 = jnp.ones((1, PX), jnp.float32)
    gpref0 = jnp.zeros((1, PX), jnp.float32)
    jax.lax.fori_loop(0, n_blocks, block, (trans0, gpref0))

    dbg_ref[0, 0, :] = jax.lax.dot_general(      # Σ_px T_fin·g  [1, ch] on MXU
        t_fin, g_img, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]

    out_dma = pltpu.make_async_copy(
        dbuf, dpay_hbm.at[pl.ds(start, k_max), :], wsem)
    out_dma.start()
    out_dma.wait()


@functools.partial(jax.jit,
                   static_argnames=("tx_n", "ty_n", "k_max", "g_block"))
def _blend_bwd_pallas(offsets, sorted_payload, bg, img, alpha, g_img, g_alpha,
                      tx_n: int, ty_n: int, k_max: int, g_block: int = 128):
    T = tx_n * ty_n
    ch = bg.shape[-1]
    kernel = functools.partial(_bwd_kernel, k_max=k_max, ch=ch, tx_n=tx_n,
                               g_block=g_block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty_n, tx_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                 # payload
            pl.BlockSpec((1, ch), lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),                # bg
            pl.BlockSpec((1, PX, ch), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),                # g_img
            pl.BlockSpec((1, 1, PX), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),                # g_alpha
            pl.BlockSpec((1, PX, ch), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),                # img
            pl.BlockSpec((1, 1, PX), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),                # alpha out
            pl.BlockSpec(memory_space=pltpu.HBM),                 # d_payload init
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                 # d_payload
            pl.BlockSpec((1, 1, ch), lambda i, j, c: (i * tx_n + j, 0, 0),
                         memory_space=pltpu.VMEM),                # d_bg tiles
        ],
        scratch_shapes=[
            pltpu.VMEM((2, k_max, PAYLOAD_WIDTH), jnp.float32),
            pltpu.VMEM((k_max, PAYLOAD_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # zero-initialized donated buffer aliased with the d_payload output: rows
    # the kernel never owns (sentinel tail, per-tile K-cap overflow gaps) stay
    # zero, and the output lives in HBM (Mosaic allocates non-aliased
    # whole-array outputs in scoped VMEM, which OOMs at scene scale)
    dpay_init = jnp.zeros(sorted_payload.shape, jnp.float32)
    d_payload, d_bg_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(sorted_payload.shape, jnp.float32),
            jax.ShapeDtypeStruct((T, 1, ch), jnp.float32),
        ],
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            # the blockwise gradient body keeps ~30 MB of [G, PX] temporaries
            # live; raise the scoped-VMEM cap above the 16 MB default (v5e has
            # 128 MB of physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024),
    )(offsets, sorted_payload, bg.reshape(1, ch), g_img, g_alpha, img, alpha,
      dpay_init)
    if jax.default_backend() == "cpu":
        # interpret mode does not emulate the aliased zero-init, leaving
        # never-written rows (sentinel tail, K-cap overflow gaps) as NaN —
        # mask them. On TPU the donated zeros buffer makes those rows exact
        # zeros and this [L]-sized searchsorted pass (80 ms at scene scale)
        # is skipped.
        L = sorted_payload.shape[0]
        ids = jnp.arange(L, dtype=jnp.int32)
        tile_of = jnp.clip(
            jnp.searchsorted(offsets, ids, side="right") - 1, 0, T - 1)
        owned = (ids < offsets[T]) & ((ids - offsets[tile_of]) < k_max)
        d_payload = jnp.where(owned[:, None], d_payload, 0.0)
    return d_payload, jnp.sum(d_bg_tiles[:, 0, :], axis=0)


# ───────────────────────── custom_vjp wrapper ─────────────────────────

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def blend_core(offsets, sorted_payload, bg, tx_n, ty_n, k_max, g_block=None,
               dma_block=None):
    """Differentiable tile blend over sorted pair payloads.

    Returns (img [T·PX… image layout H', W', ch], alpha [H', W']) like
    blend_tiles_pallas_dma. ``dma_block`` only affects the forward window
    copy (None = one full-window DMA, the measured-fastest default)."""
    return blend_tiles_pallas_dma(offsets, sorted_payload, bg, tx_n, ty_n,
                                  k_max, g_block=g_block, dma_block=dma_block)


def _blend_core_fwd(offsets, sorted_payload, bg, tx_n, ty_n, k_max, g_block,
                    dma_block):
    img, alpha = blend_tiles_pallas_dma(offsets, sorted_payload, bg, tx_n,
                                        ty_n, k_max, g_block=g_block,
                                        dma_block=dma_block)
    return (img, alpha), (offsets, sorted_payload, bg, img, alpha)


def _image_to_tiles(x, tx_n, ty_n):
    """[H', W', ...] image layout → [T, PX, ...] tile-list layout."""
    ch_dims = x.shape[2:]
    x = x.reshape(ty_n, TILE, tx_n, TILE, *ch_dims).swapaxes(1, 2)
    return x.reshape(tx_n * ty_n, PX, *ch_dims)


def _blend_core_bwd(tx_n, ty_n, k_max, g_block, dma_block, res, cot):
    offsets, sorted_payload, bg, img, alpha = res
    g_img, g_alpha = cot
    T = tx_n * ty_n
    img_t = _image_to_tiles(img, tx_n, ty_n)
    alpha_t = _image_to_tiles(alpha, tx_n, ty_n).reshape(T, 1, PX)
    gimg_t = _image_to_tiles(g_img, tx_n, ty_n)
    galpha_t = _image_to_tiles(g_alpha, tx_n, ty_n).reshape(T, 1, PX)
    # same None->256-if-divisible default as the forward (blend_pallas.py):
    # the measured 256-row block win applies to the backward body too
    d_payload, d_bg = _blend_bwd_pallas(
        offsets, sorted_payload, bg, img_t, alpha_t, gimg_t, galpha_t,
        tx_n, ty_n, k_max,
        g_block=g_block or (256 if k_max % 256 == 0 else 128))
    return None, d_payload, d_bg


blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)
