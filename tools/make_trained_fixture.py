"""Regenerate the committed trained-prior fixture (tests/fixtures/trained).

The fixture converts the reference-code-execution parity story into a
*trained-artifact* accuracy gate (VERDICT r4 next #1): no real datasets or
paper checkpoints ship in this environment, so we train the small diffusion
prior on the synthetic low-rank pose family from tests/test_system_synthetic.py
— a family whose depth structure 2D observations cannot recover, so any
accuracy the pipeline achieves below geometry-only error is attributable to
the learned score — and commit:

  checkpoint/checkpoint_trained.pth   reference .pth format (module.-prefixed
                                      state_dict + positional EMA shadow list,
                                      train_pose_mini.py:389-397 layout)
  checkpoint/orbax_trained/           the same weights in the native orbax form
  data/h36m/h36m_test.pkl             24 held-out family scenes in the H36M
                                      pickle schema (h36m.py loader), mm units
  clusters/h36m_cluster1.npy          family-mean init pose [1,17,3] (meters)
  clusters/h36m_cluster2.npy          2-hypothesis variant [2,17,3]
  family.npz                          mu, U, gt poses, recorded gate numbers

`tests/test_trained_artifact.py` then drives the UNMODIFIED opt_main CLI path
over this directory and gates its eval_multi MPJPE; `bench.py --trained`
re-verifies the bf16 and score_reuse accuracy bounds on these trained weights
at the headline shape.

Run hermetically:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/make_trained_fixture.py
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

J = 17
RANK = 6
SCALE = 0.25
HIDDEN, EMBED, BLOCKS = 256, 128, 2
TRAIN_STEPS = 3000
BATCH = 512
N_EVAL = 24
FIXTURE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "trained"))

# camera/geometry of the committed scenes (h36m-like: IPO_T=3 config reaches
# 1.5-6 m via the 0.5-2x T scale search, configs/optim _base)
FX = 1000.0
CX = 500.0
T_VEC = np.array([0.15, 0.0, 3.5], np.float32)  # meters


def pose_family(seed=0, n=4096):
    rng = np.random.RandomState(seed)
    mu = rng.randn(J, 3).astype(np.float32) * SCALE
    u = rng.randn(RANK, J, 3).astype(np.float32) * SCALE / 2
    z = rng.randn(n, RANK).astype(np.float32)
    poses = mu[None] + np.einsum("nr,rjd->njd", z, u)
    return (poses - poses[:, 0:1]).astype(np.float32), mu, u


def family_scenes(mu, u, seed, n):
    """Held-out draws -> (gt root-centered [n,J,3] m, K [n,3,3], px [n,J,2]).

    Delegates to zedo_tpu.bench_trained.make_scenes — the ONE implementation
    of the fixture's scene/camera convention — so the committed scenes and
    the bench's held-out draws can never desync (code review r5)."""
    from zedo_tpu import bench_trained

    family = {"mu": mu, "u": u, "fx": FX, "cx": CX, "t_vec": T_VEC}
    return bench_trained.make_scenes(family, n, seed=seed)


def train_prior():
    import jax
    import jax.numpy as jnp
    import ml_collections

    from zedo_tpu.diffusion import losses as losses_lib
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp

    train_poses, mu, u = pose_family()
    cfg = score_mlp.ScoreMLPConfig(
        n_joints=J, joint_dim=3, hidden_dim=HIDDEN, embed_dim=EMBED,
        n_blocks=BLOCKS, embedding_type="positional", dropout=0.0,
    )
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    conf = ml_collections.ConfigDict()
    conf.optim = ml_collections.ConfigDict(
        dict(optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8, warmup=100,
             grad_clip=1.0))
    optimizer = losses_lib.get_optimizer(conf)
    state = losses_lib.init_train_state(params, optimizer, ema_decay=0.999)
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)

    def model_apply(p, x, labels, cond, msk, train=False, rng=None):
        return score_mlp.apply(p, cfg, x, labels, cond, msk, train=train,
                               rng=rng)

    step_fn = jax.jit(losses_lib.get_step_fn(
        sde, model_apply, optimizer, train=True, reduce_mean=True))
    key = jax.random.PRNGKey(1)
    data = jnp.asarray(train_poses)
    losses = []
    for i in range(TRAIN_STEPS):
        key, bk, sk = jax.random.split(key, 3)
        idx = jax.random.randint(bk, (BATCH,), 0, len(data))
        state, loss = step_fn(state, sk, data[idx])
        losses.append(float(loss))
        if i % 500 == 0 or i == TRAIN_STEPS - 1:
            print(f"step {i}: loss {loss:.4f}")
    assert np.mean(losses[-100:]) < 0.5 * np.mean(losses[:100]), "no training"
    from zedo_tpu.diffusion import ema as ema_lib

    return cfg, state.params, ema_lib.params_of(state.ema), mu, u


def write_checkpoints(cfg, params, ema_params):
    import torch

    from zedo_tpu.utils.checkpoint import (_param_order, save_native,
                                           tree_to_flat)

    ckpt_dir = os.path.join(FIXTURE, "checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)

    flat = {k: np.asarray(v, np.float32) for k, v in tree_to_flat(params).items()}
    sd = {"module." + k: torch.tensor(v) for k, v in flat.items()}
    ema_flat = tree_to_flat(ema_params)
    shadow = [torch.tensor(np.asarray(ema_flat[name], np.float32))
              for name in _param_order(cfg)]
    torch.save(
        {"epoch": 1, "model_state_dict": sd, "optimizer_state_dict": None,
         "ema": {"decay": 0.999, "num_updates": TRAIN_STEPS,
                 "shadow_params": shadow},
         "step": TRAIN_STEPS},
        os.path.join(ckpt_dir, "checkpoint_trained.pth"))

    orbax_path = os.path.join(ckpt_dir, "orbax_trained")
    import shutil

    if os.path.isdir(orbax_path):
        shutil.rmtree(orbax_path)
    save_native(orbax_path, {
        "params": jax_to_np(params),
        "ema": {"shadow_params": jax_to_np(ema_params)},
        "step": TRAIN_STEPS,
    })
    print("checkpoints written:", ckpt_dir)


def jax_to_np(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)


def write_scenes(mu, u):
    gt, k, px = family_scenes(mu, u, seed=7, n=N_EVAL)
    data_dir = os.path.join(FIXTURE, "data", "h36m")
    os.makedirs(data_dir, exist_ok=True)
    items = []
    for i in range(N_EVAL):
        cam_mm = (gt[i] + T_VEC[None]) * 1000.0  # h36m pickles are mm
        img = np.zeros((J, 3))
        img[:, :2] = px[i]
        items.append({
            "joint_3d_camera": cam_mm.astype(np.float64),
            "joint_3d_image": img,
            "camera_param": {"fx": np.array(FX), "fy": np.array(FX),
                             "cx": np.array(CX), "cy": np.array(CX)},
            "image_path": f"synthetic_{i}.jpg",
            "action": 2 + (i % 3),
        })
    with open(os.path.join(data_dir, "h36m_test.pkl"), "wb") as f:
        pickle.dump(items, f)

    cl_dir = os.path.join(FIXTURE, "clusters")
    os.makedirs(cl_dir, exist_ok=True)
    rng = np.random.RandomState(3)
    c1 = (mu - mu[0:1])[None]  # family mean, root-centered
    c2 = np.concatenate(
        [c1, c1 + rng.randn(1, J, 3).astype(np.float32) * 0.1])
    np.save(os.path.join(cl_dir, "h36m_cluster1.npy"), c1.astype(np.float32))
    np.save(os.path.join(cl_dir, "h36m_cluster2.npy"), c2.astype(np.float32))
    print("scenes + clusters written")
    return gt


def gate_numbers(cfg, params, mu, u, gt):
    """Record the regeneration-time solve accuracy (the gate's anchor)."""
    import jax
    import jax.numpy as jnp

    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.zeroshot import ipo as ipo_lib
    from zedo_tpu.zeroshot import oil as oil_lib
    from zedo_tpu.zeroshot import pipeline

    _, k, px = family_scenes(mu, u, seed=7, n=N_EVAL)
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    # the h36m config's exact ZeDO settings (IPO 500 / OIL 1000 / keylist /
    # IPO_T=3) — what the CLI gate will run
    zcfg = pipeline.ZeDOConfig(
        ipo=ipo_lib.IPOConfig(iterations=500, keypoint_list=(0, 1, 4),
                              rot_axes="z", t_norm=3.0),
        oil=oil_lib.OILConfig(iterations=1000, sampling_eps=0.01),
    )
    clusters = (mu - mu[0:1])[None].astype(np.float32)
    res = pipeline.solve(params, cfg, sde, sampler, zcfg,
                         jnp.asarray(clusters), jnp.asarray(px), None,
                         jnp.asarray(k), rng=jax.random.PRNGKey(0),
                         precision=jax.lax.Precision.HIGHEST)
    pred = np.asarray(res.poses)[:, 0]
    pred = pred - pred[:, 0:1]
    mpjpe_mm = float(np.sqrt(((pred - gt) ** 2).sum(-1)).mean() * 1000)
    init_mm = float(np.sqrt(
        ((np.broadcast_to(clusters[0], gt.shape) - gt) ** 2).sum(-1)
    ).mean() * 1000)
    print(f"regeneration gate: trained MPJPE {mpjpe_mm:.1f}mm "
          f"(cluster init {init_mm:.1f}mm)")
    return mpjpe_mm, init_mm


def main():
    cfg, params, ema_params, mu, u = train_prior()
    write_checkpoints(cfg, params, ema_params)
    gt = write_scenes(mu, u)
    mpjpe_mm, init_mm = gate_numbers(cfg, params, mu, u, gt)
    np.savez(os.path.join(FIXTURE, "family.npz"),
             mu=mu, u=u, gt=gt, mpjpe_mm=mpjpe_mm, init_mm=init_mm,
             hidden=HIDDEN, embed=EMBED, n_blocks=BLOCKS,
             fx=FX, cx=CX, t_vec=T_VEC)
    print("fixture complete:", FIXTURE)


if __name__ == "__main__":
    main()
