"""Unit tests: linalg, camera, procrustes, metrics, gradient field.

Gradient-field parity is checked against a literal numpy transcription of the
reference algorithm (simple_zeroshot_opt.py:46-125) — same stacked system,
same conf^2-on-both-sides weighting.
"""
import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.ops import camera, gradient_field as gf, linalg, metrics
from zedo_tpu.ops.procrustes import align_to_gt_batched, procrustes


# ---------------------------------------------------------------- linalg
def test_inv3x3_vs_numpy(rng):
    m = rng.randn(64, 3, 3).astype(np.float32) + np.eye(3) * 2
    got = np.asarray(linalg.inv3x3(jnp.asarray(m)))
    want = np.linalg.inv(m)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_solve3x3_vs_numpy(rng):
    a = rng.randn(32, 3, 3).astype(np.float64) + np.eye(3) * 3
    b = rng.randn(32, 3).astype(np.float64)
    got = np.asarray(linalg.solve3x3(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- camera
def _intrinsics(n, rng):
    k = np.zeros((n, 3, 3), dtype=np.float32)
    k[:, 0, 0] = 1000 + rng.rand(n) * 200
    k[:, 1, 1] = 1000 + rng.rand(n) * 200
    k[:, 0, 2] = 500 + rng.rand(n) * 20
    k[:, 1, 2] = 500 + rng.rand(n) * 20
    k[:, 2, 2] = 1
    return k


def test_project_backproject_roundtrip(rng):
    n, j = 16, 17
    k = _intrinsics(n, rng)
    pts = rng.randn(n, j, 3).astype(np.float32)
    pts[..., 2] += 5.0  # in front of camera
    px = camera.project(jnp.asarray(pts), jnp.asarray(k))
    rays = np.asarray(camera.backproject_rays(px, jnp.asarray(k)))
    # rays are z-normalized directions through the projected points
    np.testing.assert_allclose(rays[..., 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(
        rays[..., :2] * pts[..., 2:], pts[..., :2], rtol=1e-3, atol=1e-3
    )


def test_world_camera_roundtrip(rng):
    from scipy.spatial.transform import Rotation as R

    p = rng.randn(17, 3)
    r = R.random(random_state=rng).as_matrix()
    t = rng.randn(3, 1)
    cam = camera.world_to_camera_frame(jnp.asarray(p), jnp.asarray(r), jnp.asarray(t))
    back = np.asarray(camera.camera_to_world_frame(cam, jnp.asarray(r), jnp.asarray(t)))
    np.testing.assert_allclose(back, p, atol=1e-6)


# ------------------------------------------------------------ procrustes
def _ref_procrustes(A, B, scaling=True, reflection="best"):
    """Literal numpy transcription of lib/utils/transforms.py:42-127."""
    n, dim_x = A.shape
    A_bar, B_bar = A.mean(0), B.mean(0)
    A0, B0 = A - A_bar, B - B_bar
    ssX, ssY = (A0**2).sum(), (B0**2).sum()
    A_norm, B_norm = np.sqrt(ssX), np.sqrt(ssY)
    A0, B0 = A0 / A_norm, B0 / B_norm
    M = np.dot(A0.T, B0)
    U, s, Vt = np.linalg.svd(M)
    V = Vt.T
    R = np.dot(V, U.T)
    if reflection != "best":
        have_reflection = np.linalg.det(R) < 0
        if reflection != have_reflection:
            V[:, -1] *= -1
            s[-1] *= -1
            R = np.dot(V, U.T)
    S_trace = s.sum()
    if scaling:
        Z = A_norm * S_trace * np.dot(B0, R) + A_bar
    else:
        Z = B_norm * np.dot(B0, R) + A_bar
    return Z


def test_procrustes_vs_reference(rng):
    # JAX runs f32 (x64 disabled, matching production); reference math in f64.
    for scaling in [True, False]:
        for reflection in ["best", True, False]:
            a = rng.randn(17, 3).astype(np.float64)
            b = rng.randn(17, 3).astype(np.float64)
            got = np.asarray(
                procrustes(jnp.asarray(a), jnp.asarray(b), scaling, reflection).z
            )
            want = _ref_procrustes(a, b, scaling, reflection)
            np.testing.assert_allclose(got, want, atol=5e-6, err_msg=f"{scaling} {reflection}")


def test_procrustes_recovers_similarity(rng):
    from scipy.spatial.transform import Rotation as R

    gt = rng.randn(17, 3)
    r = R.random(random_state=rng).as_matrix()
    pred = 0.7 * gt @ r.T + rng.randn(1, 3)
    aligned = np.asarray(procrustes(jnp.asarray(gt), jnp.asarray(pred)).z)
    np.testing.assert_allclose(aligned, gt, atol=1e-5)


def test_align_batched_shape(rng):
    pred = rng.randn(4, 5, 17, 3).astype(np.float32)
    gt = rng.randn(4, 5, 17, 3).astype(np.float32)
    out = align_to_gt_batched(jnp.asarray(pred), jnp.asarray(gt))
    assert out.shape == (4, 5, 17, 3)


# --------------------------------------------------------------- metrics
def test_mpjpe_and_pck(rng):
    gt = rng.randn(50, 17, 3).astype(np.float32)
    pred = gt + 0.05  # 50mm offset on each axis -> ~86.6mm per joint
    e = np.asarray(metrics.mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(e, np.sqrt(3) * 0.05, rtol=1e-4)
    pck = metrics.compute_pck(gt, pred)  # 86.6mm < 150mm everywhere
    assert pck == 100.0
    pck_strict = metrics.compute_pck(gt, pred, threshold=50.0)
    assert pck_strict == 0.0
    auc = metrics.compute_auc(gt, pred)
    # err 86.6mm: correct for thresholds 90..150 -> 13 of 31 thresholds
    np.testing.assert_allclose(auc, 100.0 * 13 / 31, atol=0.1)


def test_pa_mpjpe_zero_for_similarity(rng):
    from scipy.spatial.transform import Rotation as R

    gt = rng.randn(8, 17, 3).astype(np.float64)
    r = R.random(8, random_state=rng).as_matrix()
    pred = 1.3 * np.einsum("bij,bnj->bni", r, gt) + rng.randn(8, 1, 3)
    e = np.asarray(metrics.pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(e, 0.0, atol=1e-5)


# --------------------------------------------------------- gradient field
def _ref_gradient_field(key2d, key3d, K, t=None, conf=None):
    """Literal numpy transcription of simple_zeroshot_opt.py:46-125."""
    Kinv = np.linalg.inv(K)
    key2d_h = np.concatenate(
        [key2d, np.ones((key2d.shape[0], key2d.shape[1], 1))], axis=-1
    )
    if conf is not None:
        conf = conf.copy()
        conf[conf > 1] = 1
        conf[conf < 1e-4] = 1e-4
    ray2d = np.einsum("bij,bnj->bni", Kinv, key2d_h)
    ray2d = ray2d / ray2d[:, :, 2:]
    if t is None:
        A = np.zeros((key3d.shape[0], key3d.shape[1] * 2, 3))
        b = np.zeros((key3d.shape[0], key3d.shape[1] * 2, 1))
        b[:, 0::2, :] = key3d[:, :, 0:1] - key3d[:, :, 2:3] * ray2d[:, :, 0:1]
        b[:, 1::2, :] = key3d[:, :, 1:2] - key3d[:, :, 2:3] * ray2d[:, :, 1:2]
        A[:, 0::2, 0] = -1
        A[:, 0::2, 2] = ray2d[:, :, 0]
        A[:, 1::2, 1] = -1
        A[:, 1::2, 2] = ray2d[:, :, 1]
        if conf is not None:
            A[:, 0::2, :] *= conf[:, :, None] * conf[:, :, None]
            A[:, 1::2, :] *= conf[:, :, None] * conf[:, :, None]
            b[:, 0::2, :] *= conf[:, :, None] * conf[:, :, None]
            b[:, 1::2, :] *= conf[:, :, None] * conf[:, :, None]
        ATA = np.einsum("bji,bjk->bik", A, A)
        ATb = np.einsum("bji,bjk->bik", A, b)
        T = np.einsum("bij,bjk->bik", np.linalg.inv(ATA), ATb).transpose(0, 2, 1)
        T[T[:, :, 2] < 0] = T[T[:, :, 2] < 0] * -1
    else:
        T = t
    ray2d = ray2d / np.linalg.norm(ray2d, axis=-1, keepdims=True)
    point = key3d + T
    projection = np.sum(point * ray2d, axis=-1, keepdims=True) * ray2d
    return projection - point, T


def _synthetic_scene(rng, b=8, j=17):
    k = _intrinsics(b, rng).astype(np.float64)
    pose = rng.randn(b, j, 3) * 0.3
    pose -= pose[:, 0:1]
    t_true = np.zeros((b, 1, 3))
    t_true[..., 2] = 4.0 + rng.rand(b, 1)
    px = np.asarray(camera.project(jnp.asarray(pose + t_true), jnp.asarray(k)))
    return k, pose, t_true, px


def test_gradient_field_matches_reference(rng):
    k, pose, _, px = _synthetic_scene(rng)
    conf = rng.rand(8, 17) * 1.5  # exercise clamping on both ends
    conf[:, 0] = 1e-6
    cur = pose + rng.randn(*pose.shape) * 0.05

    got_g, got_t = gf.gradient_field(jnp.asarray(px), jnp.asarray(cur), jnp.asarray(k), conf=jnp.asarray(conf))
    want_g, want_t = _ref_gradient_field(px, cur, k, conf=conf)
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=1e-4, atol=1e-5)


def test_gradient_field_fixed_t_matches_reference(rng):
    k, pose, t_true, px = _synthetic_scene(rng)
    cur = pose + rng.randn(*pose.shape) * 0.05
    got_g, _ = gf.gradient_field(jnp.asarray(px), jnp.asarray(cur), jnp.asarray(k), t=jnp.asarray(t_true))
    want_g, _ = _ref_gradient_field(px, cur, k, t=t_true)
    np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=1e-4, atol=1e-5)


def test_gradient_field_recovers_translation(rng):
    """T solved from a clean scene must match the true translation."""
    k, pose, t_true, px = _synthetic_scene(rng)
    _, t = gf.gradient_field(jnp.asarray(px), jnp.asarray(pose), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(t), t_true, rtol=1e-4, atol=1e-5)


def test_gradient_descent_converges(rng):
    """Iterating x += grad shrinks ray distance (the reference's __main__ smoke
    test, simple_zeroshot_opt.py:127-147 — made into an assertion)."""
    k, pose, t_true, px = _synthetic_scene(rng, b=4)
    cur = jnp.asarray(pose + rng.randn(*pose.shape) * 0.2)
    px_j, k_j, t_j = jnp.asarray(px), jnp.asarray(k), jnp.asarray(t_true)

    def norm(x):
        g, _ = gf.gradient_field(px_j, x, k_j, t=t_j)
        return float(jnp.mean(jnp.linalg.norm(g, axis=-1)))

    first = norm(cur)
    for _ in range(10):
        g, _ = gf.gradient_field(px_j, cur, k_j, t=t_j)
        cur = cur + g
    assert norm(cur) < first * 1e-3
