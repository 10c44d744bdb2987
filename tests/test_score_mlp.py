"""Golden tests: zedo_tpu ScoreMLP vs an independent torch oracle, plus
checkpoint conversion (SURVEY.md §4 golden tier)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_mirror import TorchScoreMLP
from zedo_tpu.models import score_mlp
from zedo_tpu.utils import checkpoint as ckpt_lib


def _convert(torch_model, cfg):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return ckpt_lib.params_from_torch_state_dict(sd, cfg)


def _compare(cfg, torch_model, atol=2e-5):
    torch_model.eval()
    params = _convert(torch_model, cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(8, cfg.n_joints, cfg.joint_dim).astype(np.float32)
    if cfg.embedding_type == "positional":
        t = (rng.rand(8).astype(np.float32) * 0.1) * 999.0  # continuous labels
    else:
        t = rng.rand(8).astype(np.float32) * 0.5 + 0.01
    with torch.no_grad():
        want = torch_model(torch.tensor(x), torch.tensor(t)).numpy()
    got = np.asarray(score_mlp.apply(params, cfg, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_positional_model_matches_torch():
    cfg = score_mlp.ScoreMLPConfig(embedding_type="positional")
    _compare(cfg, TorchScoreMLP(embedding_type="positional"))


def test_fourier_model_matches_torch():
    cfg = score_mlp.ScoreMLPConfig(embedding_type="fourier")
    _compare(cfg, TorchScoreMLP(embedding_type="fourier"))


def test_scale_by_sigma_fourier():
    cfg = score_mlp.ScoreMLPConfig(embedding_type="fourier", scale_by_sigma=True)
    # division by small sigma amplifies f32 noise slightly
    _compare(cfg, TorchScoreMLP(embedding_type="fourier", scale_by_sigma=True), atol=1e-4)


def test_small_arch_matches_torch():
    cfg = score_mlp.ScoreMLPConfig(
        n_joints=12, joint_dim=3, hidden_dim=128, embed_dim=64, n_blocks=2
    )
    _compare(
        cfg, TorchScoreMLP(n_joints=12, joint_dim=3, hidden=128, embed=64, n_blocks=2)
    )


def test_full_pth_checkpoint_roundtrip(tmp_path):
    """Emulate the reference checkpoint format (DataParallel prefix + EMA
    shadow list, train_pose_mini.py:389-397) end to end."""
    cfg = score_mlp.ScoreMLPConfig(
        n_joints=4, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=2
    )
    tm = TorchScoreMLP(n_joints=4, joint_dim=3, hidden=64, embed=32, n_blocks=2)
    tm.eval()
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    shadow = [p.detach().clone() * 0.5 for p in tm.parameters() if p.requires_grad]
    path = tmp_path / "checkpoint_test.pth"
    torch.save(
        {
            "epoch": 7,
            "model_state_dict": sd,
            "optimizer_state_dict": None,
            "ema": {"decay": 0.9999, "num_updates": 42, "shadow_params": shadow},
            "step": 99,
        },
        path,
    )
    out = ckpt_lib.load_torch_checkpoint(str(path), cfg)
    assert out["step"] == 99 and out["epoch"] == 7

    x = np.random.RandomState(1).randn(4, 4, 3).astype(np.float32)
    t = np.full((4,), 50.0, np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x), torch.tensor(t)).numpy()
    got = np.asarray(score_mlp.apply(out["params"], cfg, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    # EMA params: every trainable leaf halved, buffers kept
    ema = out["ema_params"]
    np.testing.assert_allclose(
        np.asarray(ema["pre_dense"]["weight"]),
        tm.pre_dense.weight.detach().numpy() * 0.5,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(ema["sigmas"]), np.asarray(out["params"]["sigmas"]), atol=0
    )


def test_dropout_train_mode_statistics():
    cfg = score_mlp.ScoreMLPConfig(
        n_joints=4, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=1, dropout=0.25
    )
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((16, 4, 3))
    t = jnp.full((16,), 10.0)
    a = score_mlp.apply(params, cfg, x, t, train=True, rng=jax.random.PRNGKey(1))
    b = score_mlp.apply(params, cfg, x, t, train=True, rng=jax.random.PRNGKey(2))
    c = score_mlp.apply(params, cfg, x, t, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # rng-dependent
    d = score_mlp.apply(params, cfg, x, t, train=False)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))  # eval deterministic


def test_init_param_statistics():
    """Torch-default init: weight bounds 1/sqrt(fan_in)."""
    cfg = score_mlp.ScoreMLPConfig()
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    w = np.asarray(params["b1_dense1"]["weight"])
    bound = 1 / np.sqrt(1024)
    assert w.max() <= bound and w.min() >= -bound
    assert abs(w.std() - bound / np.sqrt(3)) < 0.001  # uniform std = bound/sqrt(3)
    assert np.all(np.asarray(params["pre_gnorm"]["weight"]) == 1.0)
