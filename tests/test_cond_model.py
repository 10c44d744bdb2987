"""Conditional score model tests (the reconstructed model_cond)."""
import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.models import nn, score_mlp, score_mlp_cond


def _cfg():
    return score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=2,
        embedding_type="positional", dropout=0.0,
    )


def test_cond_zeroed_equals_trunk(rng):
    """With the *_cond projections zeroed, output equals the plain trunk."""
    cfg = _cfg()
    params = score_mlp_cond.init_params(jax.random.PRNGKey(0), cfg)
    for k in list(params):
        if k.endswith("_cond") or k == "cond_embed":
            params[k] = nn.zero_module(params[k])
    x = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    t = jnp.full((4,), 30.0)
    cond = jnp.asarray(rng.rand(4, 17, 2).astype(np.float32))
    got = score_mlp_cond.apply(params, cfg, x, t, cond)
    trunk = {k: v for k, v in params.items() if not k.endswith("_cond") and k != "cond_embed"}
    want = score_mlp.apply(trunk, cfg, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_cond_2d_vs_3d_zmask(rng):
    """2D conditions (zero z) must have their depth residual masked out;
    3D conditions keep it."""
    cfg = _cfg()
    params = score_mlp_cond.init_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.randn(2, 17, 3).astype(np.float32))
    t = jnp.full((2,), 30.0)
    cond2d = jnp.concatenate([x[..., :2], jnp.zeros_like(x[..., :1])], axis=-1)
    cond3d = x * 0.9
    out2d = score_mlp_cond.apply(params, cfg, x, t, cond2d)
    out3d = score_mlp_cond.apply(params, cfg, x, t, cond3d)
    assert not np.allclose(np.asarray(out2d), np.asarray(out3d))
    # a 2-channel condition is zero-padded internally
    out2d_b = score_mlp_cond.apply(params, cfg, x, t, x[..., :2])
    np.testing.assert_allclose(
        np.asarray(score_mlp_cond.apply(params, cfg, x, t, cond2d)),
        np.asarray(out2d_b), atol=1e-6,
    )


def test_random_mask_condition_probs():
    cfg = _cfg()
    mask_cfg = score_mlp_cond.CondMaskConfig(pose_mask_prob=1.0)
    cond = jnp.ones((8, 17, 3))
    out = score_mlp_cond.random_mask_condition(jax.random.PRNGKey(0), cond, cfg, mask_cfg)
    assert float(jnp.sum(jnp.abs(out))) == 0.0  # prob 1 -> all dropped
    mask_cfg = score_mlp_cond.CondMaskConfig(joint_mask_prob=0.5)
    out = score_mlp_cond.random_mask_condition(jax.random.PRNGKey(1), cond, cfg, mask_cfg)
    frac = float(jnp.mean((jnp.sum(jnp.abs(out), axis=-1) == 0)))
    assert 0.3 < frac < 0.7
    mask_cfg = score_mlp_cond.CondMaskConfig(part_mask_prob=1.0)
    out = score_mlp_cond.random_mask_condition(jax.random.PRNGKey(2), cond, cfg, mask_cfg)
    assert float(jnp.sum(jnp.abs(out))) == 0.0  # all parts masked covers all joints


def test_classifier_free_guidance(rng):
    cfg = _cfg()
    params = score_mlp_cond.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 17, 3).astype(np.float32))
    t = jnp.full((2,), 30.0)
    cond = jnp.asarray(rng.rand(2, 17, 3).astype(np.float32))
    out0 = score_mlp_cond.classifier_free_apply(params, cfg, x, t, cond, w=0.0)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(score_mlp_cond.apply(params, cfg, x, t, cond)),
        atol=1e-6,
    )
    out2 = score_mlp_cond.classifier_free_apply(params, cfg, x, t, cond, w=2.0)
    assert not np.allclose(np.asarray(out0), np.asarray(out2))


def test_cond_train_mode_runs(rng):
    cfg = _cfg()
    params = score_mlp_cond.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    t = jnp.full((4,), 30.0)
    cond = x * 0.9
    out = score_mlp_cond.apply(
        params, cfg, x, t, cond, train=True, rng=jax.random.PRNGKey(3),
        mask_cfg=score_mlp_cond.CondMaskConfig(pose_mask_prob=0.1, joint_mask_prob=0.1),
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_classifier_free_null_matches_dropout_null(rng):
    """The guidance 'unconditional' branch must hit the SAME null state
    train-time condition dropout produces (re-expressed cond zeroed) — raw
    zero keypoints would re-express to cond = batch.xy (package review r3)."""
    import jax
    import jax.numpy as jnp

    from zedo_tpu.models import score_mlp_cond

    cfg = score_mlp_cond.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=1,
        embedding_type="positional",
    )
    params = score_mlp_cond.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    labels = jnp.full((4,), 12.0)
    cond2d = jnp.asarray(rng.randn(4, 17, 2).astype(np.float32))

    out_null = score_mlp_cond.apply(params, cfg, x, labels, cond2d,
                                    force_null_condition=True)
    # the null forward must be condition-INDEPENDENT
    out_null2 = score_mlp_cond.apply(params, cfg, x, labels, cond2d * 5 + 1,
                                     force_null_condition=True)
    np.testing.assert_array_equal(np.asarray(out_null), np.asarray(out_null2))
    # and differ from the conditioned forward
    out_cond = score_mlp_cond.apply(params, cfg, x, labels, cond2d)
    assert not np.allclose(np.asarray(out_null), np.asarray(out_cond))
    # w=0 guidance reduces to the conditional forward
    out_w0 = score_mlp_cond.classifier_free_apply(params, cfg, x, labels,
                                                  cond2d, w=0.0)
    np.testing.assert_allclose(np.asarray(out_w0), np.asarray(out_cond),
                               rtol=1e-6)


def test_cond_none_is_null_condition(rng):
    """apply(condition=None) must produce the NULL-condition output, not the
    re-expressed cond = batch.xy fake (package review r4): every
    unconditional caller (registry, OIL generic path, eval sampling) relies
    on this default."""
    cfg = _cfg()
    params = score_mlp_cond.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(4, cfg.n_joints, 3).astype(np.float32))
    t = jnp.full((4,), 12.0, jnp.float32)
    got_none = np.asarray(score_mlp_cond.apply(params, cfg, x, t, None))
    want_null = np.asarray(score_mlp_cond.apply(
        params, cfg, x, t, x * 0.37, force_null_condition=True))
    np.testing.assert_array_equal(got_none, want_null)
    # and it differs from the fake-condition state (raw zero keypoints)
    fake = np.asarray(score_mlp_cond.apply(
        params, cfg, x, t, jnp.zeros_like(x)))
    assert not np.allclose(got_none, fake)
