"""TPU-native 2D image inpainting — the built-in LaMa-equivalent.

The reference vendors LaMa (~12.5k LoC, lama/) purely to fill the holes left
by object removal before the masked finetune (lama/prepare_pseudo_label.py:1-25
copies the inpainted frames into ``images_inpaint_unseen/``). LaMa is an
external learned model with its own checkpoint; this module provides the
in-framework alternative so the edit workflow runs end to end without any
external tool: classic mask-aware push–pull hole filling followed by Jacobi
diffusion, as one jitted XLA program.

Algorithm (all static shapes, no data-dependent control flow):
  1. *Push*: build a validity-weighted image pyramid — each level is
     ``resize(img·w) / resize(w)`` at half resolution, so known pixels
     propagate into holes at a rate of one octave per level. At the coarsest
     level every pixel has support (unless the whole image is masked).
  2. *Pull*: walk back up, keeping known pixels and filling holes with the
     bilinear-upsampled coarser estimate.
  3. *Diffusion*: ``smooth_iters`` Jacobi iterations of the 4-neighbour
     Laplacian applied only inside the hole — erases the blocky pyramid
     seams and yields the membrane (harmonic) interpolant of the boundary.

This is not a learned texture synthesizer; for photorealistic fill the CLI
keeps the external-images hook (scripts/edit_object_inpaint.py --images).
For the finetune's purpose — plausible low-frequency content where an object
was removed — the harmonic fill is the standard classical choice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _down(x: jax.Array) -> jax.Array:
    """Half-resolution bilinear downsample (H and W each ≥ 1)."""
    h = max(x.shape[0] // 2, 1)
    w = max(x.shape[1] // 2, 1)
    return jax.image.resize(x, (h, w) + x.shape[2:], method="bilinear")


@partial(jax.jit, static_argnames=("smooth_iters",))
def inpaint_pushpull(image: jax.Array, hole: jax.Array,
                     smooth_iters: int = 64) -> jax.Array:
    """Fill ``hole`` pixels of ``image`` from the surrounding content.

    image: [H, W, C] float; hole: [H, W] bool (True = pixel to fill).
    Returns [H, W, C] with known pixels bit-identical to the input.
    """
    img = image.astype(jnp.float32)
    w = (~hole).astype(jnp.float32)[..., None]                    # [H, W, 1]

    # push: weighted pyramid down to 1×1
    pyr = [(img * w, w)]
    while max(pyr[-1][0].shape[0], pyr[-1][0].shape[1]) > 1:
        iw, ww = pyr[-1]
        pyr.append((_down(iw), _down(ww)))

    # pull: coarsest estimate, then fill unknowns level by level
    iw, ww = pyr[-1]
    est = iw / jnp.maximum(ww, 1e-8)
    for iw, ww in reversed(pyr[:-1]):
        up = jax.image.resize(est, iw.shape, method="bilinear")
        have = ww > 1e-8
        est = jnp.where(have, iw / jnp.maximum(ww, 1e-8), up)

    filled = jnp.where(w > 0, img, est)

    # diffusion: Jacobi relaxation of the hole toward the harmonic interpolant
    hole3 = hole[..., None]

    def jacobi(_, x):
        # edge-clamped 4-neighbor shifts (jnp.roll would wrap borders and
        # bleed the opposite edge's colors into frame-border holes)
        up_ = jnp.concatenate([x[:1], x[:-1]], axis=0)
        dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
        lf = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        rt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        avg = (up_ + dn + lf + rt) * 0.25
        return jnp.where(hole3, avg, x)

    out = jax.lax.fori_loop(0, smooth_iters, jacobi, filled)
    return jnp.where(hole3, out, image.astype(jnp.float32))


def inpaint_frames(images, masks, smooth_iters: int = 64):
    """Batch helper: [V, H, W, C] images + [V, H, W] bool masks → filled
    frames, scanned on device (one compile, V sequential fills)."""
    def one(_, im_m):
        im, mk = im_m
        return None, inpaint_pushpull(im, mk, smooth_iters=smooth_iters)

    _, out = jax.lax.scan(one, None, (images, masks))
    return out
