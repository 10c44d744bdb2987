"""System-level validation: train a diffusion prior on a synthetic pose
family, then verify the zero-shot pipeline uses it to resolve monocular depth
ambiguity (the paper's core claim, with no real datasets available in CI).

The pose family is a low-rank Gaussian factor model (mu + U z): the score is
learnable by the small MLP in ~1500 steps, and poses have genuine 3D structure
that 2D observations alone cannot recover — the perpendicular ray gradient
never moves points along their rays, so depth must come from the prior.
"""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from zedo_tpu.diffusion import losses as losses_lib
from zedo_tpu.diffusion.sampling import PCSampler
from zedo_tpu.diffusion.sde import SubVPSDE
from zedo_tpu.models import score_mlp
from zedo_tpu.ops import camera
from zedo_tpu.zeroshot import ipo as ipo_lib
from zedo_tpu.zeroshot import oil as oil_lib
from zedo_tpu.zeroshot import pipeline

J = 17


def _pose_family(rng, n, rank=6, scale=0.25):
    """mu + U z poses, root-centered."""
    mu = rng.randn(J, 3).astype(np.float32) * scale
    u = rng.randn(rank, J, 3).astype(np.float32) * scale / 2
    z = rng.randn(n, rank).astype(np.float32)
    poses = mu[None] + np.einsum("nr,rjd->njd", z, u)
    return (poses - poses[:, 0:1]).astype(np.float32), (mu, u)


@pytest.fixture(scope="module")
def trained_prior():
    rng = np.random.RandomState(0)
    train_poses, family = _pose_family(rng, 4096)

    cfg = score_mlp.ScoreMLPConfig(
        n_joints=J, joint_dim=3, hidden_dim=256, embed_dim=128, n_blocks=2,
        embedding_type="positional", dropout=0.0,
    )
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)

    conf = ml_collections.ConfigDict()
    conf.optim = ml_collections.ConfigDict(
        dict(optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8, warmup=100,
             grad_clip=1.0)
    )
    optimizer = losses_lib.get_optimizer(conf)
    state = losses_lib.init_train_state(params, optimizer, ema_decay=0.999)
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)

    def model_apply(p, x, labels, cond, msk, train=False, rng=None):
        return score_mlp.apply(p, cfg, x, labels, cond, msk, train=train, rng=rng)

    step_fn = jax.jit(
        losses_lib.get_step_fn(sde, model_apply, optimizer, train=True,
                               reduce_mean=True)
    )
    key = jax.random.PRNGKey(1)
    data = jnp.asarray(train_poses)
    losses = []
    for i in range(1500):
        key, bk, sk = jax.random.split(key, 3)
        idx = jax.random.randint(bk, (512,), 0, len(data))
        state, loss = step_fn(state, sk, data[idx])
        losses.append(float(loss))
    assert np.mean(losses[-100:]) < np.mean(losses[:100]) * 0.5, "prior didn't train"
    return cfg, state.params, family


def _make_scene(family, rng, n=48):
    mu, u = family
    z = rng.randn(n, u.shape[0]).astype(np.float32)
    gt = mu[None] + np.einsum("nr,rjd->njd", z, u)
    gt = (gt - gt[:, 0:1]).astype(np.float32)
    k = np.zeros((n, 3, 3), np.float32)
    k[:, 0, 0] = k[:, 1, 1] = 1000.0
    k[:, 0, 2] = k[:, 1, 2] = 500.0
    k[:, 2, 2] = 1.0
    t = np.zeros((n, 1, 3), np.float32)
    t[..., 2] = 4.0
    px = np.asarray(camera.project(jnp.asarray(gt + t), jnp.asarray(k)))
    # cluster init: the family mean plus a perturbation (a "wrong but
    # plausible" pose, like the reference's cluster centers)
    cluster = (mu - mu[0:1]) + rng.randn(J, 3).astype(np.float32) * 0.1
    return gt, k, px, cluster[None]


def _mpjpe(pred, gt):
    return float(np.sqrt(((pred - gt) ** 2).sum(-1)).mean() * 1000)


def test_trained_prior_beats_no_prior(trained_prior):
    cfg, params, family = trained_prior
    rng = np.random.RandomState(7)
    gt, k, px, clusters = _make_scene(family, rng)

    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig(
        ipo=ipo_lib.IPOConfig(iterations=200, keypoint_list=(0, 1, 4),
                              rot_axes="z", t_norm=4.0),
        oil=oil_lib.OILConfig(iterations=400, sampling_eps=0.01),
    )

    def run(p):
        res = pipeline.solve(p, cfg, sde, sampler, zcfg, jnp.asarray(clusters),
                             jnp.asarray(px), None, jnp.asarray(k),
                             precision=jax.lax.Precision.HIGHEST)
        return np.asarray(res.poses)[:, 0]

    pred_prior = run(params)

    no_prior = dict(params)
    no_prior["post_dense"] = {
        "weight": jnp.zeros_like(params["post_dense"]["weight"]),
        "bias": jnp.zeros_like(params["post_dense"]["bias"]),
    }
    pred_geo = run(no_prior)

    init_err = _mpjpe(np.broadcast_to(clusters[0], gt.shape), gt)
    err_prior = _mpjpe(pred_prior, gt)
    err_geo = _mpjpe(pred_geo, gt)
    print(f"MPJPE init {init_err:.1f}mm | geometry-only {err_geo:.1f}mm | "
          f"with trained prior {err_prior:.1f}mm")

    # geometry helps over the raw init, and the learned prior must beat
    # geometry alone by resolving depth (the system's core claim)
    assert err_geo < init_err
    assert err_prior < 0.8 * err_geo
    # absolute sanity (loose: 1500-step prior on a rank-6 family lands ~100mm)
    assert err_prior < 150.0


def test_score_reuse_accuracy_characterization(trained_prior):
    """score_reuse=2 (half the score-net NFE) against exact dynamics on the
    trained-prior family: the accuracy cost must be a small fraction of the
    prior's own gain (VERDICT r1 #4's characterization ask). Numbers land in
    the test log; the bound is the acceptance gate for shipping reuse as an
    opt-in speed knob."""
    cfg, params, family = trained_prior
    rng = np.random.RandomState(13)
    gt, k, px, clusters = _make_scene(family, rng, n=32)

    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)

    def run(reuse):
        zcfg = pipeline.ZeDOConfig(
            ipo=ipo_lib.IPOConfig(iterations=200, keypoint_list=(0, 1, 4),
                                  rot_axes="z", t_norm=4.0),
            oil=oil_lib.OILConfig(iterations=400, sampling_eps=0.01,
                                  score_reuse=reuse),
        )
        res = pipeline.solve(params, cfg, sde, sampler, zcfg,
                             jnp.asarray(clusters), jnp.asarray(px), None,
                             jnp.asarray(k),
                             precision=jax.lax.Precision.HIGHEST)
        return np.asarray(res.poses)[:, 0]

    pred1 = run(1)
    pred2 = run(2)
    err1 = _mpjpe(pred1, gt)
    err2 = _mpjpe(pred2, gt)
    init_err = _mpjpe(np.broadcast_to(clusters[0], gt.shape), gt)
    print(f"MPJPE exact (reuse=1) {err1:.1f}mm | reuse=2 {err2:.1f}mm | "
          f"init {init_err:.1f}mm")
    # reuse=2 must keep >=80% of the exact pipeline's improvement over init
    assert err2 < err1 + 0.2 * (init_err - err1)
    # and stay pointwise close to the exact trajectory family
    assert abs(err2 - err1) < 25.0  # mm


def test_multi_hypothesis_improves(trained_prior):
    """Clusters from make_clusters + min-over-hypotheses beats 1 hypothesis."""
    from tools.make_clusters import make_clusters

    cfg, params, family = trained_prior
    rng = np.random.RandomState(11)
    gt, k, px, _ = _make_scene(family, rng, n=32)
    train_poses, _ = _pose_family(np.random.RandomState(0), 512)
    clusters = make_clusters(train_poses, 3, seed=0)

    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig(
        ipo=ipo_lib.IPOConfig(iterations=150, keypoint_list=(0, 1, 4),
                              rot_axes="z", t_norm=4.0),
        oil=oil_lib.OILConfig(iterations=300, sampling_eps=0.01),
    )
    res = pipeline.solve(params, cfg, sde, sampler, zcfg, jnp.asarray(clusters),
                         jnp.asarray(px), None, jnp.asarray(k),
                         precision=jax.lax.Precision.HIGHEST)
    poses = np.asarray(res.poses)  # [N, 3, j, 3]
    per_hypo = np.sqrt(((poses - gt[:, None]) ** 2).sum(-1)).mean(-1)
    best = per_hypo.min(axis=1).mean() * 1000
    single = per_hypo[:, 0].mean() * 1000
    print(f"single-hypothesis {single:.1f}mm | min-of-3 {best:.1f}mm")
    assert best <= single
    assert best < 200.0
