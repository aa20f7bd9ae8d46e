"""Inpainting quality measurement (VERDICT round-2: the LaMa substitute had
"no visual-quality comparison"). The push-pull + diffusion filler
(ops/inpaint.py) is scored on structured synthetic images with known ground
truth under the holes: hole-region PSNR floors for smooth content, plus a
regression test that frame-border holes take their color from the NEAR edge
(the pre-round-3 jnp.roll neighborhood pulled the opposite edge in).

Reference being substituted: the vendored LaMa 2D inpainter
(lama/, driven by the object-removal workflow)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _structured_image(rng, H=96, W=96):
    """Smooth gradients + piecewise-constant shapes: the content class a
    membrane interpolant should handle well (textureless fills)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing="ij")
    img = np.stack([0.3 + 0.5 * xx, 0.2 + 0.6 * yy,
                    0.5 + 0.3 * np.sin(3 * xx + 2 * yy)], axis=-1)
    img[20:44, 30:60] = [0.85, 0.2, 0.15]
    img[60:85, 10:40] = [0.1, 0.55, 0.8]
    return np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1).astype(
        np.float32)


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_inpaint_hole_psnr_floor(rng):
    """Interior holes over smooth/flat regions reconstruct above 25 dB."""
    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    img = _structured_image(rng)
    mask = np.zeros(img.shape[:2], bool)
    mask[30:40, 40:52] = True            # inside the flat red shape
    mask[5:14, 5:20] = True              # smooth gradient region
    out = np.asarray(inpaint_pushpull(jnp.asarray(img), jnp.asarray(mask),
                                      smooth_iters=128))
    assert np.array_equal(out[~mask], img[~mask]), "known pixels must not move"
    psnr = _psnr(out[mask], img[mask])
    assert psnr > 25.0, f"hole PSNR {psnr:.1f} dB"


def test_inpaint_border_hole_uses_near_edge(rng):
    """A hole touching the left border must fill from the left region's
    color, NOT the right edge (jnp.roll wrap regression, ADVICE round-2)."""
    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    H, W = 64, 64
    img = np.zeros((H, W, 3), np.float32)
    img[:, : W // 2] = [0.1, 0.6, 0.1]          # left = green
    img[:, W // 2:] = [0.9, 0.1, 0.1]           # right = red
    mask = np.zeros((H, W), bool)
    mask[24:40, 0:6] = True                     # hole ON the left border
    out = np.asarray(inpaint_pushpull(jnp.asarray(img), jnp.asarray(mask),
                                      smooth_iters=256))
    fill = out[24:40, 0:6]
    assert fill[..., 1].mean() > 0.45, "border hole must fill green (near edge)"
    assert fill[..., 0].mean() < 0.3, "red from the opposite edge leaked in"


def test_inpaint_quality_report(rng, capsys):
    """Measured quality summary over hole sizes (recorded in BASELINE.md):
    PSNR must degrade gracefully with hole radius, never below 18 dB on this
    content class."""
    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    img = _structured_image(rng)
    H, W = img.shape[:2]
    rows = []
    for r in (3, 6, 10):
        mask = np.zeros((H, W), bool)
        for cy, cx in [(12, 70), (50, 50), (80, 75)]:
            yy, xx = np.ogrid[:H, :W]
            mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        out = np.asarray(inpaint_pushpull(jnp.asarray(img), jnp.asarray(mask),
                                          smooth_iters=128))
        rows.append((r, _psnr(out[mask], img[mask])))
    print("inpaint hole-radius→PSNR: "
          + ", ".join(f"r{r}={p:.1f}dB" for r, p in rows))
    assert all(p > 18.0 for _, p in rows), rows
    assert rows[0][1] >= rows[-1][1] - 1.0, "small holes must not score worse"
