import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segsplat_tpu.ops import rasterize as R
from tests import oracles


def make_gaussians(rng, n=64, depth_range=(1.0, 3.0)):
    means3d = np.column_stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
        rng.uniform(*depth_range, n)]).astype(np.float32)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.3 - 3.0).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return means3d, scales, quats, opac, colors


CAM = dict(fx=40.0, fy=40.0, cx=16.0, cy=16.0, width=32, height=32)


def test_projection_basics(rng):
    means3d, scales, quats, opac, colors = make_gaussians(rng)
    proj = R.project_gaussians(jnp.asarray(means3d), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.eye(4),
                               CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                               CAM["width"], CAM["height"])
    assert bool(jnp.any(proj.valid))
    # center gaussian projects near principal point
    c3d = jnp.array([[0.0, 0.0, 2.0]])
    p = R.project_gaussians(c3d, jnp.full((1, 3), 0.05), jnp.array([[1.0, 0, 0, 0]]),
                            jnp.eye(4), CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                            CAM["width"], CAM["height"])
    assert np.allclose(np.asarray(p.means2d[0]), [16.0, 16.0], atol=1e-4)
    # behind-camera gaussian culled
    b3d = jnp.array([[0.0, 0.0, -1.0]])
    pb = R.project_gaussians(b3d, jnp.full((1, 3), 0.05), jnp.array([[1.0, 0, 0, 0]]),
                             jnp.eye(4), CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                             CAM["width"], CAM["height"])
    assert not bool(pb.valid[0])


def test_rasterize_matches_bruteforce_oracle(rng):
    means3d, scales, quats, opac, colors = make_gaussians(rng, n=48)
    out = R.rasterize(jnp.asarray(means3d), jnp.asarray(scales), jnp.asarray(quats),
                      jnp.asarray(opac), jnp.asarray(colors), jnp.eye(4),
                      CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                      CAM["width"], CAM["height"],
                      bg=jnp.array([0.2, 0.3, 0.4]))
    proj = R.project_gaussians(jnp.asarray(means3d), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.eye(4),
                               CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                               CAM["width"], CAM["height"])
    ref_img, ref_alpha = oracles.oracle_rasterize(
        np.asarray(proj.means2d), np.asarray(proj.conics), np.asarray(proj.depths),
        np.asarray(proj.radii), np.asarray(proj.valid), colors, opac,
        np.array([0.2, 0.3, 0.4]), CAM["width"], CAM["height"])
    got = np.asarray(out["image"])
    assert got.shape == (32, 32, 3)
    err = np.abs(got - ref_img).max()
    assert err < 5e-3, f"max pixel error {err}"
    assert np.abs(np.asarray(out["alpha"]) - ref_alpha).max() < 5e-3


def test_channel_generic(rng):
    """Same geometry, 32-channel payload (the semantic-logit pass)."""
    means3d, scales, quats, opac, _ = make_gaussians(rng, n=32)
    logits = rng.normal(size=(32, 7)).astype(np.float32)
    payload = R.pad_logits_to_channels(jnp.asarray(logits), 32)
    assert payload.shape == (32, 32)
    out = R.rasterize(jnp.asarray(means3d), jnp.asarray(scales), jnp.asarray(quats),
                      jnp.asarray(opac), payload, jnp.eye(4),
                      CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                      CAM["width"], CAM["height"])
    assert out["image"].shape == (32, 32, 32)
    # padded channels render as zero everywhere (bg default 0)
    assert float(jnp.abs(out["image"][..., 7:]).max()) < 1e-5


def test_gradients_flow(rng):
    """Screenspace-offset gradients (densification contract) + color/opacity grads."""
    means3d, scales, quats, opac, colors = make_gaussians(rng, n=24)
    target = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)

    def loss_fn(colors_j, opac_j, offset):
        out = R.rasterize(jnp.asarray(means3d), jnp.asarray(scales),
                          jnp.asarray(quats), opac_j, colors_j, jnp.eye(4),
                          CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                          CAM["width"], CAM["height"], means2d_offset=offset)
        return jnp.mean((out["image"] - target) ** 2)

    g_col, g_op, g_off = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(colors), jnp.asarray(opac), jnp.zeros((24, 2)))
    assert np.isfinite(np.asarray(g_col)).all()
    assert float(jnp.abs(g_col).sum()) > 0
    assert float(jnp.abs(g_op).sum()) > 0
    assert float(jnp.abs(g_off).sum()) > 0, "screenspace-mean grads must flow"


def test_gradient_directional_derivative(rng):
    """jvp and vjp must agree on a random direction (adjoint consistency) — a
    numerically robust alternative to finite differences in f32."""
    means3d, scales, quats, opac, colors = make_gaussians(rng, n=8)

    def loss_fn(op):
        out = R.rasterize(jnp.asarray(means3d), jnp.asarray(scales),
                          jnp.asarray(quats), op, jnp.asarray(colors), jnp.eye(4),
                          CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                          CAM["width"], CAM["height"])
        return jnp.sum(out["image"])

    op = jnp.asarray(opac)
    v = jnp.asarray(rng.normal(size=opac.shape).astype(np.float32))
    _, jvp_val = jax.jvp(loss_fn, (op,), (v,))
    g = jax.grad(loss_fn)(op)
    assert float(jvp_val) == pytest.approx(float(jnp.vdot(g, v)), rel=1e-3)
    assert float(jnp.abs(g).sum()) > 0


def test_depth_ordering_occlusion():
    """An opaque near gaussian must occlude a far one at the shared pixel."""
    means3d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    scales = jnp.full((2, 3), 0.05)
    quats = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    opac = jnp.array([0.99, 0.99])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = R.rasterize(means3d, scales, quats, opac, colors, jnp.eye(4),
                      CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                      CAM["width"], CAM["height"])
    center = np.asarray(out["image"][16, 16])
    assert center[0] > 0.8 and center[1] < 0.2, f"red must win: {center}"


def test_background_composites():
    out = R.rasterize(jnp.zeros((1, 3)).at[0, 2].set(-5.0),  # behind camera
                      jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]),
                      jnp.array([0.5]), jnp.array([[1.0, 1.0, 1.0]]), jnp.eye(4),
                      CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                      CAM["width"], CAM["height"], bg=jnp.array([0.25, 0.5, 0.75]))
    img = np.asarray(out["image"])
    assert np.allclose(img, np.array([0.25, 0.5, 0.75]), atol=1e-6)


def test_tile_overflow_surfaced_vs_unbounded_oracle(rng):
    """Depth complexity > max_per_tile: the K-cap drop is REPORTED
    (tile_overflow > 0), and raising K back above the stack depth reproduces
    the unbounded oracle blend exactly (the reference's per-tile lists are
    unbounded, gaussian_renderer/__init__.py:85-120)."""
    n = 80
    # all Gaussians stacked over the same few pixels → one deep tile
    means3d = np.column_stack([
        rng.uniform(-0.02, 0.02, n), rng.uniform(-0.02, 0.02, n),
        rng.uniform(1.0, 3.0, n)]).astype(np.float32)
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    opac = rng.uniform(0.02, 0.1, n).astype(np.float32)   # low → no early-out
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    args = (jnp.asarray(means3d), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors), jnp.eye(4),
            CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
            CAM["width"], CAM["height"])

    capped = R.rasterize(*args, bg=jnp.zeros(3), max_per_tile=16)
    assert int(capped["tile_overflow"]) > 0

    full = R.rasterize(*args, bg=jnp.zeros(3), max_per_tile=128)
    assert int(full["tile_overflow"]) == 0
    proj = R.project_gaussians(jnp.asarray(means3d), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.eye(4),
                               CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
                               CAM["width"], CAM["height"])
    ref_img, _ = oracles.oracle_rasterize(
        np.asarray(proj.means2d), np.asarray(proj.conics),
        np.asarray(proj.depths), np.asarray(proj.radii),
        np.asarray(proj.valid), colors, opac, np.zeros(3),
        CAM["width"], CAM["height"])
    assert np.abs(np.asarray(full["image"]) - ref_img).max() < 5e-3
    # the capped render must actually differ (pairs were dropped, not hidden)
    assert np.abs(np.asarray(capped["image"]) - ref_img).max() > 1e-3
