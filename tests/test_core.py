import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segsplat_tpu.core import transforms as T
from segsplat_tpu.core import sh as sh_mod
from segsplat_tpu.core.types import Camera, GaussianTable, VoxelGrid


def test_quat_roundtrip(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(T.quat_to_rotmat(jnp.asarray(q)))
    # rotation matrices: orthonormal, det 1
    eye = np.einsum("nij,nkj->nik", R, R)
    assert np.allclose(eye, np.eye(3)[None], atol=1e-5)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # matches the COLMAP-convention converter for normalized quats
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    for i in range(4):
        assert np.allclose(R[i], T.qvec2rotmat(qn[i]), atol=1e-5)


def test_rotmat2qvec_roundtrip(rng):
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    for qi in q:
        R = T.qvec2rotmat(qi)
        assert np.allclose(T.rotmat2qvec(R), qi, atol=1e-6)


def test_covariance_psd(rng):
    s = np.exp(rng.normal(size=(16, 3)).astype(np.float32) * 0.3)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    cov = np.asarray(T.build_covariance_3d(jnp.asarray(s), jnp.asarray(q)))
    eig = np.linalg.eigvalsh(cov)
    assert (eig > 0).all()
    packed = np.asarray(T.strip_symmetric(jnp.asarray(cov)))
    assert packed.shape == (16, 6)
    assert np.allclose(packed[:, 0], cov[:, 0, 0])


def test_world2view_projection():
    R = T.qvec2rotmat(np.array([0.9, 0.1, 0.2, 0.1]) / np.linalg.norm([0.9, 0.1, 0.2, 0.1]))
    Rc2w = R.T
    t = np.array([0.3, -0.2, 1.5])
    w2v = T.get_world2view(Rc2w, t)
    # camera center maps to origin
    c2w = np.linalg.inv(w2v)
    center = c2w[:3, 3]
    p = w2v @ np.append(center, 1.0)
    assert np.allclose(p[:3], 0, atol=1e-5)
    # projection matrix maps znear plane to depth 0 and zfar to zfar/(zfar-znear) after
    # perspective divide ⇒ ndc z in [0, 1]
    P = T.get_projection_matrix(0.01, 100.0, 1.0, 0.8)
    pt = P @ np.array([0, 0, 0.01, 1.0])
    assert pt[2] / pt[3] == pytest.approx(0.0, abs=1e-5)
    pt = P @ np.array([0, 0, 100.0, 1.0])
    assert pt[2] / pt[3] == pytest.approx(1.0, abs=1e-4)


def test_sh_constant_term():
    sh = np.zeros((5, 16, 3), np.float32)
    sh[:, 0, :] = 1.0
    dirs = np.tile(np.array([0, 0, 1.0], np.float32), (5, 1))
    out = np.asarray(sh_mod.eval_sh(3, jnp.asarray(sh), jnp.asarray(dirs)))
    assert np.allclose(out, sh_mod.C0, atol=1e-6)
    # rgb2sh/sh2rgb inverse
    rgb = np.random.default_rng(1).random((10, 3)).astype(np.float32)
    assert np.allclose(np.asarray(sh_mod.sh2rgb(sh_mod.rgb2sh(jnp.asarray(rgb)))), rgb, atol=1e-6)


def test_gaussian_table_pytree():
    t = GaussianTable.empty(64, max_sh_degree=2)
    assert t.features_rest.shape == (64, 8, 3)
    leaves = jax.tree_util.tree_leaves(t)
    assert all(hasattr(l, "shape") for l in leaves)
    t2 = jax.tree_util.tree_map(lambda x: x, t)
    assert t2.max_sh_degree == 2
    # jit through the pytree
    f = jax.jit(lambda g: g.get_opacity().sum())
    assert float(f(t)) == pytest.approx(64 * 0.5)


def test_camera_math():
    cam = Camera(R=jnp.eye(3), T=jnp.array([0.0, 0.0, 2.0]),
                 fov_x=jnp.array(1.2), fov_y=jnp.array(0.9), width=640, height=480)
    K = np.asarray(cam.intrinsics())
    assert K[0, 2] == 320 and K[1, 2] == 240
    assert np.allclose(np.asarray(cam.camera_center()), [0, 0, -2])
    w2v = np.asarray(cam.world_view_transform())
    p = w2v @ np.array([0, 0, -2, 1.0])
    assert np.allclose(p[:3], 0, atol=1e-6)


def test_voxel_grid_centers():
    g = VoxelGrid(coords=jnp.array([[0, 0, 0], [1, 2, 3]], jnp.int32),
                  origin=jnp.array([1.0, 1.0, 1.0]), voxel_size=jnp.array(0.5),
                  shape=(4, 4, 4))
    c = np.asarray(g.centers())
    assert np.allclose(c[0], [1, 1, 1])
    assert np.allclose(c[1], [1.5, 2.0, 2.5])


def test_expon_lr():
    f = T.get_expon_lr_func(1e-2, 1e-4, max_steps=100)
    assert float(f(0)) == pytest.approx(1e-2, rel=1e-3)
    assert float(f(100)) == pytest.approx(1e-4, rel=1e-3)
    assert float(f(50)) == pytest.approx(1e-3, rel=1e-3)


def test_ssim_separable_matches_full_window(rng):
    """The separable two-pass blur must equal the full 2-D Gaussian window."""
    import jax
    import jax.numpy as jnp
    from segsplat_tpu.train.losses import _gaussian_window, ssim

    a = jnp.asarray(rng.random((3, 40, 56)), jnp.float32)
    b = jnp.asarray(rng.random((3, 40, 56)), jnp.float32)

    # reference: full 11x11 window conv
    w = _gaussian_window(11, 1.5)
    kernel = jnp.broadcast_to(w[None, None], (3, 1, 11, 11))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x[None], kernel, window_strides=(1, 1), padding=[(5, 5)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=3)[0]

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 * mu1
    s2 = blur(b * b) - mu2 * mu2
    s12 = blur(a * b) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ref = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
           / ((mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2))).mean()

    got = ssim(a, b)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert float(ssim(a, a)) > 0.999
