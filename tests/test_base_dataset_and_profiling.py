"""Base-dataset machinery (augs, rep, cond_3d_prob) + profiling utils."""
import time

import numpy as np

from zedo_tpu.data.base import PoseDataset, denormalize_data, normalize_data
from zedo_tpu.utils.profiling import Stopwatch, annotate, trace


class _DS(PoseDataset):
    def read_data(self):
        r = np.random.RandomState(3)
        self.db_2d = r.rand(10, 17, 2).astype(np.float32) * 500
        self.db_3d = r.randn(10, 17, 3).astype(np.float32)
        self.camera_param = np.broadcast_to(np.eye(3, dtype=np.float32), (10, 3, 3)).copy()


def test_getitem_pads_2d_and_rep():
    ds = _DS(subset="test", rep=3)
    assert len(ds) == 30
    d2, d3 = ds[25]  # wraps modulo real length
    assert d2.shape == (17, 3) and (d2[:, 2] == 0).all()
    np.testing.assert_array_equal(d3, ds.db_3d[25 % 10])


def test_random_flip_swaps_sides():
    ds = _DS(subset="train", flip=True, rng=np.random.RandomState(0))
    data = np.arange(17 * 3, dtype=np.float32).reshape(17, 3)
    flipped = ds._random_flip(data.copy(), p=1.0)
    np.testing.assert_allclose(flipped[1], data[4] * [-1, 1, 1])  # right<-left
    np.testing.assert_allclose(flipped[4], data[1] * [-1, 1, 1])
    same = ds._random_flip(data.copy(), p=0.0)
    np.testing.assert_array_equal(same, data)


def test_random_rotate_preserves_norms():
    ds = _DS(subset="train", rot=True, rng=np.random.RandomState(0))
    data = np.random.RandomState(1).randn(17, 3)
    rotated = ds._random_rotate(data.copy(), p=1.0)
    np.testing.assert_allclose(
        np.linalg.norm(rotated, axis=1), np.linalg.norm(data, axis=1), rtol=1e-6
    )


def test_cond_3d_prob_returns_3d():
    ds = _DS(subset="train", cond_3d_prob=1.0, rng=np.random.RandomState(0))
    d2, d3 = ds[0]
    np.testing.assert_array_equal(d2, d3)  # condition replaced by 3D


def test_add_noise_modes():
    ds = _DS(subset="test", rng=np.random.RandomState(0))
    p = np.zeros((4, 17, 2), np.float32)
    g = ds.add_noise(p, std=5, noise_type="gaussian")
    u = ds.add_noise(p, std=5, noise_type="uniform")
    assert np.abs(g).std() > 0 and np.abs(u).max() <= 2.5 + 1e-6


def test_normalize_denormalize_roundtrip(rng):
    data = rng.rand(4, 17, 3).astype(np.float32) * 800
    back = denormalize_data(normalize_data(data))
    np.testing.assert_allclose(back, data, rtol=1e-5)


def test_stopwatch_and_trace(tmp_path):
    sw = Stopwatch()
    with sw.phase("a"):
        time.sleep(0.01)
    with sw.phase("b"):
        time.sleep(0.005)
    rep = sw.report()
    assert "a:" in rep and "b:" in rep and "n=1" in rep

    import jax.numpy as jnp

    with trace(str(tmp_path / "tr")):
        with annotate("op"):
            float(jnp.sum(jnp.ones((8, 8))))
    import os
    assert any(os.scandir(tmp_path / "tr"))  # trace files written


def test_save_pose_grid(tmp_path, rng):
    from zedo_tpu.utils.visualize import save_pose_grid

    poses = rng.randn(5, 17, 3).astype(np.float32) * 0.3
    px = rng.rand(5, 17, 2).astype(np.float32) * 500
    out = save_pose_grid(str(tmp_path / "grid.png"), poses, poses_2d=px,
                         gts_3d=poses + 0.05)
    import os
    assert os.path.getsize(out) > 10000  # non-trivial PNG
