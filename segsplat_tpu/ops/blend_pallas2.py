"""Packed-payload variant of the Pallas blend kernel: TWO pairs per 128-lane row.

The DMA blend kernel (ops/blend_pallas.py) pads each 40-float pair payload to a
full 128-lane row (Mosaic DMA lane alignment), wasting 69% of the gather and
kernel-DMA traffic. Here each [128] f32 row packs two consecutive pairs (64
lanes each: mu, conic, opacity, pad, CH colors — CH ≤ 56), halving HBM bytes at
identical f32 precision.

The tile run [start, start+count) starts at an arbitrary PAIR offset, so the
kernel DMAs rows [start>>1, …] and handles the odd-start parity by selecting
which half-row holds the first pair (lax.cond over the two layouts). Blending
interleaves the two half-columns per couple:

    T_couple = (1-αA)(1-αB);  cum = shifted-multiply prefix over couples
    w_A = αA·T·cum_before;  w_B = αB·T·cum_before·(1-αA)

Validated against the unpacked kernel and the XLA blend in
tests/test_blend_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segsplat_tpu.ops.blend_pallas import GEOM, PX, TILE, _SAT_EPS, _cumprod_rows

HALF = 64                    # lanes per packed pair


def _kernel(offs_ref, payload_hbm, bg_ref, img_ref, alpha_ref, buf, sems,
            *, k_max: int, ch: int, tx_n: int, g_block: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * pl.num_programs(1) + j
    n_t = pl.num_programs(0) * pl.num_programs(1)
    rows = k_max // 2 + 1

    def dma(slot, tt):
        row0 = offs_ref[tt] // 2
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(row0, rows), :], buf.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()

    start = offs_ref[t]
    count = jnp.minimum(offs_ref[t + 1] - start, k_max)
    parity = start % 2

    pid = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (jnp.mod(pid, TILE) + j * TILE).astype(jnp.float32) + 0.5
    py = ((pid // TILE) + i * TILE).astype(jnp.float32) + 0.5

    g2 = g_block // 2
    n_blocks = k_max // g_block
    couple_ids = jax.lax.broadcasted_iota(jnp.int32, (g2, PX), 0)
    win_ref = buf.at[t % 2]

    def alpha_of(win, pair_off, b):
        mu_x = win[:, 0:1]
        mu_y = win[:, 1:2]
        ca = win[:, 2:3]
        cb = win[:, 3:4]
        cc = win[:, 4:5]
        op = win[:, 5:6]
        dx = mu_x - px
        dy = mu_y - py
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))
        p_ids = couple_ids * 2 + pair_off + b * g_block
        valid = (sigma >= 0.0) & (alpha >= 1.0 / 255.0) & (p_ids < count)
        return jnp.where(valid, alpha, 0.0), win[:, GEOM:GEOM + ch]

    def block(b, carry):
        acc, trans, done = carry

        def live(_):
            rb = b * g2
            # parity 0: A = row half0, B = same-row half1
            # parity 1: A = row half1, B = NEXT-row half0
            full = win_ref[pl.ds(rb, g2 + 1), :]               # [g2+1, 128]

            def even(_):
                return full[:-1, 0:HALF], full[:-1, HALF:]

            def odd(_):
                return full[:-1, HALF:], full[1:, 0:HALF]

            winA, winB = jax.lax.cond(parity == 0, even, odd, None)
            alphaA, colA = alpha_of(winA, 0, b)
            alphaB, colB = alpha_of(winB, 1, b)

            prod = (1.0 - alphaA) * (1.0 - alphaB)             # [g2, PX]
            cum = _cumprod_rows(prod)
            cum_before = jnp.concatenate(
                [jnp.ones((1, PX), cum.dtype), cum[:-1]], axis=0)
            tA = trans * cum_before
            wA = alphaA * tA
            wB = alphaB * tA * (1.0 - alphaA)
            new_acc = acc + jax.lax.dot_general(
                wA, colA, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            new_acc = new_acc + jax.lax.dot_general(
                wB, colB, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
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
    img_ref[0, :, :] = img
    alpha_ref[0, 0, :] = 1.0 - trans[0]


@functools.partial(jax.jit,
                   static_argnames=("tx_n", "ty_n", "k_max", "g_block"))
def blend_tiles_pallas_packed(offsets: jax.Array,     # [T+1] int32 pair offsets
                              packed_payload: jax.Array,  # [R, 128] two pairs/row
                              bg: jax.Array,
                              tx_n: int, ty_n: int, k_max: int,
                              g_block: int = 128):
    """Packed two-pairs-per-row blend. ``packed_payload`` rows = consecutive
    pair payloads side by side (64 lanes each), padded ≥ k_max//2 + 2 rows past
    offsets[-1]//2. Returns image-layout (img [H', W', CH], alpha [H', W'])."""
    T = tx_n * ty_n
    ch = bg.shape[-1]
    assert ch <= HALF - GEOM, f"packed payload supports CH ≤ {HALF - GEOM}"
    assert packed_payload.shape[-1] == 2 * HALF
    assert k_max % g_block == 0 and g_block % 2 == 0

    kernel = functools.partial(_kernel, k_max=k_max, ch=ch, tx_n=tx_n,
                               g_block=g_block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty_n, tx_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
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
            pltpu.VMEM((2, k_max // 2 + 1, 2 * HALF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
            bytes_accessed=T * (k_max // 2) * 128 * 4 + T * PX * ch * 4,
            transcendentals=T * k_max * PX,
        ),
    )(offsets, packed_payload, bg.reshape(1, ch))
    img = img.reshape(ty_n, tx_n, TILE, TILE, ch).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ty_n * TILE, tx_n * TILE, ch)
    alpha = alpha.reshape(ty_n, tx_n, TILE, TILE).transpose(0, 2, 1, 3)
    return img, alpha.reshape(ty_n * TILE, tx_n * TILE)
