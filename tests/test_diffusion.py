"""Diffusion core tests: SDE coefficients vs closed form, reverse dynamics,
EMA semantics, losses, RK45, PC sampling on an analytic score."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zedo_tpu.diffusion import ema as ema_lib
from zedo_tpu.diffusion import losses as losses_lib
from zedo_tpu.diffusion.ode import ODESampler, rk45
from zedo_tpu.diffusion.sampling import PCSampler, make_task_mask
from zedo_tpu.diffusion.score import get_score_fn
from zedo_tpu.diffusion.sde import SubVPSDE, VESDE, VPSDE, build_sde


# ------------------------------------------------------------------- SDEs
def test_vpsde_coefficients():
    sde = VPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)
    t = jnp.array([0.3, 0.7])
    x = jnp.ones((2, 17, 3))
    drift, diffusion = sde.sde(x, t)
    beta_t = 0.1 + t * 19.9
    np.testing.assert_allclose(np.asarray(diffusion), np.sqrt(beta_t), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(drift), np.asarray(-0.5 * beta_t)[:, None, None] * np.ones((2, 17, 3)),
        rtol=1e-6,
    )
    mean, std = sde.marginal_prob(x, t)
    lmc = -0.25 * t**2 * 19.9 - 0.5 * t * 0.1
    np.testing.assert_allclose(np.asarray(std), np.sqrt(1 - np.exp(2 * np.asarray(lmc))), rtol=1e-6)


def test_subvpsde_std_is_not_sqrted():
    """sub-VP marginal std = 1 - exp(2*lmc), NOT its sqrt (sde_lib.py:197)."""
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    t = jnp.array([0.05])
    _, std = sde.marginal_prob(jnp.zeros((1, 17, 3)), t)
    lmc = -0.25 * 0.05**2 * 19.9 - 0.5 * 0.05 * 0.1
    np.testing.assert_allclose(float(std[0]), 1 - math.exp(2 * lmc), rtol=1e-6)
    # diffusion discount
    _, diff = sde.sde(jnp.zeros((1, 17, 3)), t)
    beta_t = 0.1 + 0.05 * 19.9
    discount = 1 - math.exp(-2 * 0.1 * 0.05 - 19.9 * 0.05**2)
    np.testing.assert_allclose(float(diff[0]), math.sqrt(beta_t * discount), rtol=1e-6)


def test_vesde_discretize():
    sde = VESDE(sigma_min=0.01, sigma_max=50.0, n=100, t_max=1.0)
    x = jnp.zeros((2, 3, 3))
    t = jnp.array([0.5, 0.0])
    f, g = sde.discretize(x, t)
    sigmas = np.asarray(sde.discrete_sigmas)
    np.testing.assert_allclose(float(g[0]), np.sqrt(sigmas[49] ** 2 - sigmas[48] ** 2), rtol=1e-5)
    np.testing.assert_allclose(float(g[1]), sigmas[0], rtol=1e-5)


def test_reverse_probability_flow_is_deterministic():
    sde = SubVPSDE(n=1000, t_max=0.1)

    def score_fn(x, t, condition=None, mask=None):
        return -x  # gaussian-ish score

    rsde = sde.reverse(score_fn, probability_flow=True)
    x = jnp.ones((4, 17, 3))
    t = jnp.full((4,), 0.05)
    drift, diffusion = rsde.sde(x, t)
    assert float(jnp.sum(jnp.abs(diffusion))) == 0.0
    # drift = f - g^2 * score
    f, g = sde.sde(x, t)
    want = f - (g[:, None, None] ** 2) * score_fn(x, t)
    np.testing.assert_allclose(np.asarray(drift), np.asarray(want), rtol=1e-6)


def test_build_sde_dispatch():
    assert isinstance(build_sde("vpsde"), VPSDE)
    assert build_sde("subvpsde", t_max=0.1).T == 0.1
    assert isinstance(build_sde("vesde"), VESDE)
    with pytest.raises(NotImplementedError):
        build_sde("nope")


# ----------------------------------------------------------------- score fn
def test_score_fn_subvp_scaling():
    sde = SubVPSDE(n=1000, t_max=0.1)
    seen = {}

    def model_fn(x, labels, condition, mask):
        seen["labels"] = labels
        return jnp.ones_like(x)

    score_fn = get_score_fn(sde, model_fn, continuous=True)
    x = jnp.zeros((2, 17, 3))
    t = jnp.array([0.1, 0.05])
    score = score_fn(x, t)
    np.testing.assert_allclose(np.asarray(seen["labels"]), np.asarray(t) * 999, rtol=1e-6)
    _, std = sde.marginal_prob(jnp.zeros_like(x), t)
    np.testing.assert_allclose(
        np.asarray(score), -1.0 / np.asarray(std)[:, None, None] * np.ones((2, 17, 3)), rtol=1e-6
    )


# --------------------------------------------------------------------- EMA
def test_ema_matches_reference_semantics():
    """Mirror ema.py:32-51 arithmetic including num_updates warmup."""
    params = {"w": jnp.array([1.0, 2.0])}
    state = ema_lib.init(params, decay=0.999)
    shadow_ref = np.array([1.0, 2.0])
    cur = np.array([1.0, 2.0])
    for step in range(5):
        cur = cur + 0.5
        state = ema_lib.update(state, {"w": jnp.asarray(cur)})
        n = step + 1
        decay = min(0.999, (1 + n) / (10 + n))
        shadow_ref = shadow_ref - (1 - decay) * (shadow_ref - cur)
        np.testing.assert_allclose(np.asarray(state.shadow_params["w"]), shadow_ref, rtol=1e-6)


# ------------------------------------------------------------------- RK45
def test_rk45_linear_ode():
    # dy/dt = -2y from t=0 to 1: y1 = y0 exp(-2)
    y0 = jnp.ones((8,))
    y1, nfe = rk45(lambda t, y: -2.0 * y, 0.0, 1.0, y0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y1), math.exp(-2), rtol=1e-5)
    assert int(nfe) > 0


def test_rk45_backward_time():
    # integrate dy/dt = y backwards from t=1 to 0 starting at e -> 1
    y0 = jnp.full((4,), math.e)
    y1, _ = rk45(lambda t, y: y, 1.0, 0.0, y0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y1), 1.0, rtol=1e-5)


# --------------------------------------------- sampling with analytic score
def _gaussian_world(sde):
    """Data = N(mu, sigma0^2 I). Marginal p_t = N(m_t mu, (m_t sigma0)^2 + std_t^2)
    for VP-type SDEs; score is analytic."""
    mu, sigma0 = 0.7, 0.05

    def score_fn(x, t, condition=None, mask=None):
        mean_coeff = jnp.exp(
            -0.25 * t**2 * (sde.beta_max - sde.beta_min) - 0.5 * t * sde.beta_min
        )
        m = mean_coeff[:, None, None]
        var = (m * sigma0) ** 2 + (1.0 - mean_coeff**2)[:, None, None]
        return -(x - m * mu) / var

    return mu, sigma0, score_fn


def test_pc_sampler_gaussian_vp():
    """Full-loop PC sampling from a VP prior with the analytic score should
    reproduce the data distribution (integration test of predictor + scan)."""
    sde = VPSDE(beta_min=0.1, beta_max=20.0, n=500, t_max=1.0)
    mu, sigma0, score_fn = _gaussian_world(sde)
    sampler = PCSampler(
        sde=sde, predictor="euler_maruyama", corrector="none",
        probability_flow=False, denoise=True, eps=1e-3,
    )
    x = sampler.sample_loop(score_fn, jax.random.PRNGKey(0), (512, 2, 3))
    x = np.asarray(x)
    assert abs(x.mean() - mu) < 0.02
    assert abs(x.std() - sigma0) < 0.03


def test_ode_sampler_gaussian_vp():
    sde = VPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)
    mu, sigma0, score_fn = _gaussian_world(sde)
    # exact probability flow (score_coeff=0.5): transports the prior onto the
    # data distribution
    sampler = ODESampler(
        sde=sde, shape=(256, 2, 3), denoise=False, rtol=1e-4, atol=1e-4, score_coeff=0.5
    )
    x, nfe = sampler.sample(score_fn, jax.random.PRNGKey(1))
    x = np.asarray(x)
    assert abs(x.mean() - mu) < 0.02
    assert abs(x.std() - sigma0) < 0.03
    assert int(nfe) > 20

    # reference-verbatim dynamics (score term x1.0, sde_lib.py:97): the ODE
    # over-contracts — mean preserved, variance collapses. Locked in as a
    # characterization test so the quirk is never "fixed" silently.
    sampler_ref = ODESampler(sde=sde, shape=(256, 2, 3), denoise=False, rtol=1e-4, atol=1e-4)
    x_ref, _ = sampler_ref.sample(score_fn, jax.random.PRNGKey(1))
    x_ref = np.asarray(x_ref)
    assert abs(x_ref.mean() - mu) < 0.02
    assert x_ref.std() < sigma0 * 0.2


def test_zedo_pc_step_deterministic_and_shrinks():
    """ZeDO single-step: probability-flow euler_maruyama at small t is
    deterministic and pulls x toward the score direction."""
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)

    def score_fn(x, t, condition=None, mask=None):
        return -x * 50.0

    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    x0 = jnp.ones((8, 17, 3))
    x1a, m1a = sampler.zedo_pc_step(score_fn, jax.random.PRNGKey(0), x0, 0.05)
    x1b, m1b = sampler.zedo_pc_step(score_fn, jax.random.PRNGKey(7), x0, 0.05)
    np.testing.assert_array_equal(np.asarray(m1a), np.asarray(m1b))  # rng-free
    assert float(jnp.mean(jnp.abs(m1a))) < 1.0


def test_task_masks():
    m = make_task_mask("est", (4, 17, 3))
    assert m[..., -1].sum() == 0 and m[..., :2].sum() == 4 * 17 * 2
    m = make_task_mask("comp3d", (4, 17, 3), jlist="1,2")
    assert m[:, 1].sum() == 0 and m[:, 3].sum() == 4 * 3
    m = make_task_mask("gen", (4, 17, 3))
    assert m.sum() == 0
    m = make_task_mask("comp2d", (4, 17, 3), randj=2)
    assert (m[:, :, 0].sum(axis=1) == 15).all()


# ----------------------------------------------------------------- training
def test_train_step_decreases_loss():
    """Tiny model + tiny data: score-matching loss should drop."""
    import ml_collections

    from zedo_tpu.models import score_mlp

    cfg = score_mlp.ScoreMLPConfig(
        n_joints=4, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=1,
        embedding_type="positional", dropout=0.0,
    )
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)

    def model_apply(p, x, labels, cond, msk, train=False, rng=None):
        return score_mlp.apply(p, cfg, x, labels, cond, msk, train=train, rng=rng)

    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)
    conf = ml_collections.ConfigDict()
    conf.optim = ml_collections.ConfigDict(
        dict(optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8, warmup=10, grad_clip=1.0)
    )
    optimizer = losses_lib.get_optimizer(conf)
    state = losses_lib.init_train_state(params, optimizer, ema_decay=0.999)
    step_fn = jax.jit(
        losses_lib.get_step_fn(sde, model_apply, optimizer, train=True, reduce_mean=True)
    )

    key = jax.random.PRNGKey(1)
    batch = jax.random.normal(key, (128, 4, 3)) * 0.1
    first_loss = None
    for i in range(60):
        state, loss = step_fn(state, jax.random.fold_in(key, i), batch)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss
    assert int(state.step) == 60
    # eval step under EMA params runs
    eval_fn = jax.jit(losses_lib.get_step_fn(sde, model_apply, None, train=False))
    _, eval_loss = eval_fn(state, key, batch)
    assert np.isfinite(float(eval_loss))


def test_train_step_freezes_buffers(rng):
    """Non-trainable buffers never move under the train step: the fourier
    projection W is requires_grad=False in the reference (model.py:33) yet
    receives a real gradient through time_embedding, and coupled weight
    decay would shrink the zero-gradient `sigmas` buffer (package review
    r4)."""
    import ml_collections

    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp
    from zedo_tpu.train import trainer

    conf = ml_collections.ConfigDict()
    conf.optim = ml_collections.ConfigDict(dict(
        optimizer="Adam", lr=1e-2, beta1=0.9, eps=1e-8, warmup=0,
        grad_clip=1.0, weight_decay=1e-2))  # coupled L2 engaged
    cfg = score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=1,
        embedding_type="fourier")
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = losses_lib.get_optimizer(conf)
    sde = SubVPSDE(n=1000, t_max=1.0)
    step = trainer.make_train_step(sde, score_mlp.apply, cfg, optimizer)
    state = losses_lib.init_train_state(params, optimizer, 0.9999)
    batch = jnp.asarray(rng.randn(16, 17, 3).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(2)
    for _ in range(4):
        key, sk = jax.random.split(key)
        state, loss = step(state, sk, batch, None, None)
    # buffers bit-stationary; trainable weights moved
    np.testing.assert_array_equal(
        np.asarray(state.params["gauss_proj"]["W"]),
        np.asarray(params["gauss_proj"]["W"]))
    np.testing.assert_array_equal(
        np.asarray(state.params["sigmas"]), np.asarray(params["sigmas"]))
    assert not np.array_equal(
        np.asarray(state.params["pre_dense"]["weight"]),
        np.asarray(params["pre_dense"]["weight"]))


def test_sample_loop_trajectory_last_entry_is_denoised(rng):
    """Reference contract (lib/sampling.py:591): trajs[-1] == x_mean, the
    denoised final sample, not the noisy carried x."""
    from zedo_tpu.diffusion.score import get_score_fn
    from zedo_tpu.models import score_mlp

    cfg = score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=1,
        embedding_type="positional", num_scales=10)
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    sde = SubVPSDE(n=10, t_max=1.0)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=False, denoise=True)

    def model_fn(x, labels, cond, msk):
        return score_mlp.apply(params, cfg, x, labels, cond, msk)

    score_fn = get_score_fn(sde, model_fn, continuous=True)
    trajs, x_final = sampler.sample_loop(
        score_fn, jax.random.PRNGKey(3), (4, 17, 3), return_trajectory=True)
    np.testing.assert_array_equal(np.asarray(trajs[-1]), np.asarray(x_final))
    # a non-denoised sampler's x_final is the carried x, but trajs[-1]
    # still records x_mean (exactly the reference's overwrite)
    sampler_nd = PCSampler(sde=sde, predictor="euler_maruyama",
                           corrector="none", probability_flow=False,
                           denoise=False)
    trajs_nd, x_final_nd = sampler_nd.sample_loop(
        score_fn, jax.random.PRNGKey(3), (4, 17, 3), return_trajectory=True)
    assert not np.array_equal(np.asarray(trajs_nd[-1]), np.asarray(x_final_nd))
