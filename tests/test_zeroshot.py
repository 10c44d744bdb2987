"""Zero-shot optimizer tests.

The load-bearing ones are the step-for-step equivalence tests against
independent torch/numpy transcriptions of the reference's IPO loop
(opt_main.py:177-201) and OIL loop (opt_main.py:202-220) driven by the
validated torch oracle network — they pin the exact optimizer semantics,
update ordering, and the fused fast-path algebra.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_mirror import TorchScoreMLP
from zedo_tpu.diffusion.sampling import PCSampler
from zedo_tpu.diffusion.sde import SubVPSDE
from zedo_tpu.models import score_mlp
from zedo_tpu.ops import camera
from zedo_tpu.utils import checkpoint as ckpt_lib
from zedo_tpu.zeroshot import ipo as ipo_lib
from zedo_tpu.zeroshot import oil as oil_lib
from zedo_tpu.zeroshot import pipeline


def _intrinsics(n, rng):
    k = np.zeros((n, 3, 3), dtype=np.float32)
    k[:, 0, 0] = k[:, 1, 1] = 1000.0
    k[:, 0, 2] = k[:, 1, 2] = 500.0
    k[:, 2, 2] = 1
    return k


def _scene(rng, n=6, j=17):
    """Synthetic camera scene with a ground-truth pose + translation."""
    k = _intrinsics(n, rng)
    pose = rng.randn(n, j, 3).astype(np.float32) * 0.25
    pose -= pose[:, 0:1]
    t = np.zeros((n, 1, 3), dtype=np.float32)
    t[..., 2] = 4.0
    t[..., 0] = 0.3
    px = np.asarray(camera.project(jnp.asarray(pose + t), jnp.asarray(k)))
    return k, pose, t, px


# ------------------------------------------------------------------- IPO
def _torch_ipo(pose, px, K, cfg: ipo_lib.IPOConfig, t_init):
    """Independent torch transcription of RotOpt + the IPO driver
    (simple_zeroshot_opt.py:8-31 + opt_main.py:180-194)."""
    import torch.optim as optim

    from zedo_tpu.ops.rotations import quaternion_to_matrix as q2m_jax

    B = pose.shape[0]
    rot_vect = torch.ones((B, 1), requires_grad=True)
    axis_params = {a: torch.zeros((B, 1), requires_grad=True) for a in cfg.rot_axes}
    scale = torch.ones((B, 1, 1), requires_grad=True)
    T = torch.tensor(t_init)
    K_t = torch.tensor(K)
    keylist = list(cfg.keypoint_list)
    x_sel = torch.tensor(pose[:, keylist, :])
    target = torch.tensor(px[:, keylist, :2])

    def quat():
        comps = [rot_vect]
        for a in "xyz":
            comps.append(axis_params.get(a, torch.zeros((B, 1))))
        return torch.cat(comps, dim=-1)

    def q2m(q):
        r, i, j, kq = q.unbind(-1)
        two_s = 2.0 / (q * q).sum(-1)
        o = torch.stack(
            (1 - two_s * (j * j + kq * kq), two_s * (i * j - kq * r), two_s * (i * kq + j * r),
             two_s * (i * j + kq * r), 1 - two_s * (i * i + kq * kq), two_s * (j * kq - i * r),
             two_s * (i * kq - j * r), two_s * (j * kq + i * r), 1 - two_s * (i * i + j * j)),
            -1,
        )
        return o.reshape(q.shape[:-1] + (3, 3))

    opt = optim.Adam([rot_vect, *axis_params.values(), scale], lr=cfg.lr)
    for _ in range(cfg.iterations):
        opt.zero_grad()
        rot = q2m(quat())
        x = rot.bmm(x_sel.permute(0, 2, 1)) + (
            T * torch.clamp(scale, cfg.min_scale_t, cfg.max_scale_t)
        ).permute(0, 2, 1)
        x = K_t.bmm(x).permute(0, 2, 1)
        proj = x[:, :, :2] / x[:, :, 2:]
        loss = torch.mean(torch.abs(proj - target))
        loss.backward()
        opt.step()

    with torch.no_grad():
        t_final = T * torch.clamp(scale, cfg.min_scale_t, cfg.max_scale_t)
        rot_final = q2m(quat())
    return rot_final.numpy(), t_final.numpy()


def test_ipo_matches_torch_reference(rng):
    k, pose, t_true, px = _scene(rng, n=4)
    cfg = ipo_lib.IPOConfig(iterations=120, keypoint_list=(0, 1, 4), rot_axes="z",
                            t_norm=3.0, min_scale_t=0.5, max_scale_t=2.0)
    t_init = np.asarray(ipo_lib.init_translation(jnp.asarray(px), jnp.asarray(k), cfg.t_norm))
    got = ipo_lib.run_ipo(jnp.asarray(pose), jnp.asarray(px), jnp.asarray(k), cfg)
    want_rot, want_t = _torch_ipo(pose, px, k, cfg, t_init)
    np.testing.assert_allclose(np.asarray(got.rot_mat), want_rot, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.translation), want_t, atol=2e-3)


def test_ipo_init_translation():
    """T init = normalized pelvis ray * IPO_T (opt_main.py:177-179)."""
    k = np.eye(3, dtype=np.float32)[None].repeat(2, 0)
    k[:, 0, 0] = k[:, 1, 1] = 500.0
    k[:, 0, 2] = k[:, 1, 2] = 250.0
    cond = np.zeros((2, 17, 3), dtype=np.float32)
    cond[:, 0, :2] = 250.0  # principal point -> ray (0, 0, 1)
    t = np.asarray(ipo_lib.init_translation(jnp.asarray(cond), jnp.asarray(k), 3.0))
    np.testing.assert_allclose(t, np.array([[[0, 0, 3.0]]] * 2), atol=1e-5)


def test_ipo_recovers_known_rotation(rng):
    """Synthetic: pose rotated about z by a known angle must be recovered."""
    k, pose, t_true, _ = _scene(rng, n=4)
    ang = 0.6
    rz = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    rotated = np.einsum("ij,bnj->bni", rz, pose)
    px = np.asarray(camera.project(jnp.asarray(rotated + t_true), jnp.asarray(k)))
    cfg = ipo_lib.IPOConfig(
        iterations=500, keypoint_list=tuple(range(17)), rot_axes="z",
        t_norm=4.0, min_scale_t=0.5, max_scale_t=2.0,
    )
    res = ipo_lib.run_ipo(jnp.asarray(pose), jnp.asarray(px), jnp.asarray(k), cfg)
    got_rot = np.asarray(res.rot_mat)
    np.testing.assert_allclose(got_rot, np.broadcast_to(rz, got_rot.shape), atol=0.05)


# ------------------------------------------------------------------- OIL
def _ref_oil_loop(torch_model, sde_params, pose0, t0, px, conf, K, n_steps, n_fixed):
    """Independent numpy/torch transcription of the reference OIL loop
    (opt_main.py:202-220 + sampling.py:450-527 + utils.py:751-776 +
    simple_zeroshot_opt.py:46-125) for step-equivalence testing."""
    beta_min, beta_max, N, T_sde, eps = sde_params
    x = pose0.copy()
    T = t0.copy()
    timestamps = np.linspace(T_sde, eps, n_steps)
    Kinv = np.linalg.inv(K)

    conf_c = np.clip(conf, 1e-4, 1.0) if conf is not None else None

    def grad_field(key3d, t_fixed):
        hom = np.concatenate([px, np.ones_like(px[..., :1])], axis=-1)
        ray = np.einsum("bij,bnj->bni", Kinv, hom)
        ray = ray / ray[..., 2:]
        if t_fixed is None:
            A = np.zeros((key3d.shape[0], key3d.shape[1] * 2, 3), np.float64)
            b = np.zeros((key3d.shape[0], key3d.shape[1] * 2, 1), np.float64)
            b[:, 0::2, 0] = key3d[..., 0] - key3d[..., 2] * ray[..., 0]
            b[:, 1::2, 0] = key3d[..., 1] - key3d[..., 2] * ray[..., 1]
            A[:, 0::2, 0] = -1
            A[:, 0::2, 2] = ray[..., 0]
            A[:, 1::2, 1] = -1
            A[:, 1::2, 2] = ray[..., 1]
            if conf_c is not None:
                c2 = (conf_c**2)[..., None]
                A[:, 0::2] *= c2
                A[:, 1::2] *= c2
                b[:, 0::2] *= c2
                b[:, 1::2] *= c2
            ATA = np.einsum("bji,bjk->bik", A, A)
            ATb = np.einsum("bji,bjk->bik", A, b)[..., 0]
            t = np.linalg.solve(ATA, ATb[..., None])[..., 0]
            t = np.where(t[:, 2:] < 0, -t, t)[:, None, :]
        else:
            t = t_fixed
        ray_u = ray / np.linalg.norm(ray, axis=-1, keepdims=True)
        p = key3d + t
        grad = np.sum(p * ray_u, axis=-1, keepdims=True) * ray_u - p
        return grad.astype(np.float32), t.astype(np.float32)

    for i in range(n_steps):
        if i < n_fixed:
            grad, _ = grad_field(x, T)
        else:
            grad, T = grad_field(x, None)
        x = x + grad
        # one EM probability-flow step at t = timestamps[i]
        t = timestamps[i]
        with torch.no_grad():
            out = torch_model(
                torch.tensor(x), torch.tensor(np.full((x.shape[0],), t * 999, np.float32))
            ).numpy()
        lmc = -0.25 * t**2 * (beta_max - beta_min) - 0.5 * t * beta_min
        std = 1 - np.exp(2 * lmc)
        score = -out / std
        beta_t = beta_min + t * (beta_max - beta_min)
        discount = 1 - np.exp(-2 * beta_min * t - (beta_max - beta_min) * t**2)
        g2 = beta_t * discount
        drift = -0.5 * beta_t * x - g2 * score
        x = x + drift * (-1.0 / N)
        x = x.astype(np.float32)
    return x, T


def _tiny_model_and_params():
    cfg = score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=64, embed_dim=32, n_blocks=1,
        embedding_type="positional",
    )
    tm = TorchScoreMLP(n_joints=17, joint_dim=3, hidden=64, embed=32, n_blocks=1,
                       embedding_type="positional")
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = ckpt_lib.params_from_torch_state_dict(sd, cfg)
    return cfg, tm, params


def test_oil_fast_path_matches_reference_transcription(rng):
    k, pose, t_true, px = _scene(rng, n=5)
    conf = (rng.rand(5, 17) * 1.2).astype(np.float32)
    cfg_m, tm, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    x0 = (pose + rng.randn(*pose.shape).astype(np.float32) * 0.1).astype(np.float32)
    oil_cfg = oil_lib.OILConfig(iterations=25, sampling_eps=0.01, fixed_t_steps=10)

    got = oil_lib.run_oil(
        params, cfg_m, sde, sampler,
        jnp.asarray(x0), jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
        jnp.asarray(conf), oil_cfg,
    )
    # reference-transcription timestamps use the FULL schedule truncated the
    # same way (linspace over `iterations` steps)
    want_x, want_t = _ref_oil_loop(
        tm, (0.1, 20.0, 1000, 0.1, 0.01), x0, t_true, px, conf, k,
        n_steps=25, n_fixed=10,
    )
    np.testing.assert_allclose(np.asarray(got.pose), want_x, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.translation), want_t, atol=2e-4, rtol=1e-3)


def test_oil_generic_path_matches_fast_path(rng):
    """The generic registry-driven path and the fused fast path must agree
    (both deterministic under probability flow)."""
    k, pose, t_true, px = _scene(rng, n=4)
    cfg_m, _, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    x0 = (pose + 0.05).astype(np.float32)
    oil_cfg = oil_lib.OILConfig(iterations=12, sampling_eps=0.01, fixed_t_steps=5)

    fast = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                     probability_flow=True, denoise=True, eps=0.01)
    res_fast = oil_lib.run_oil(params, cfg_m, sde, fast, jnp.asarray(x0),
                               jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
                               None, oil_cfg)
    assert oil_lib._fast_supported(sde, fast)
    # force generic path by flipping a flag that doesn't change EM-PF math
    # (denoise=False returns x == x_mean + 0*z for probability flow)
    generic = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=False, eps=0.01)
    assert not oil_lib._fast_supported(sde, generic)
    res_gen = oil_lib.run_oil(params, cfg_m, sde, generic, jnp.asarray(x0),
                              jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
                              None, oil_cfg, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(res_fast.pose), np.asarray(res_gen.pose), atol=1e-4, rtol=1e-3
    )


def test_pipeline_end_to_end_reduces_error(rng):
    """Full solve on a synthetic scene with an UNTRAINED tiny prior: the
    geometric half must still drag reprojection error down by orders of
    magnitude and keep everything finite (integration test)."""
    k, pose, t_true, px = _scene(rng, n=6)
    cfg_m, _, params = _tiny_model_and_params()
    # neutralize the untrained prior (zero output head) so geometry dominates
    params["post_dense"]["weight"] = jnp.zeros_like(params["post_dense"]["weight"])
    params["post_dense"]["bias"] = jnp.zeros_like(params["post_dense"]["bias"])
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig(
        ipo=ipo_lib.IPOConfig(iterations=100, keypoint_list=(0, 1, 4), rot_axes="z",
                              t_norm=4.0),
        oil=oil_lib.OILConfig(iterations=150, sampling_eps=0.01),
    )
    clusters = jnp.asarray(pose[:2] + rng.randn(2, 17, 3).astype(np.float32) * 0.1)
    res = pipeline.solve(params, cfg_m, sde, sampler, zcfg,
                         clusters, jnp.asarray(px), None, jnp.asarray(k))
    assert res.poses.shape == (6, 2, 17, 3)
    assert np.all(np.isfinite(np.asarray(res.poses)))
    # reprojection with solved translation should land near the observations
    best = np.asarray(res.poses[:, 0]) + np.asarray(res.translations[:, 0])
    reproj = np.asarray(camera.project(jnp.asarray(best), jnp.asarray(k)))
    err = np.abs(reproj - px).mean()
    assert err < 15.0  # pixels; init clusters reproject hundreds of px off


def test_solve_sharded_matches_single_device(rng):
    """1-device vs 8-device mesh must give identical metrics (SURVEY §4's
    multi-device tier)."""
    import jax.sharding as jsh

    k, pose, t_true, px = _scene(rng, n=8)
    cfg_m, _, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig(
        ipo=ipo_lib.IPOConfig(iterations=20),
        oil=oil_lib.OILConfig(iterations=10),
    )
    clusters = jnp.asarray(pose[:2])
    args = (clusters, jnp.asarray(px), None, jnp.asarray(k))
    single = pipeline.solve(params, cfg_m, sde, sampler, zcfg, *args)

    mesh = jsh.Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    sharded = pipeline.solve_sharded(mesh, params, cfg_m, sde, sampler, zcfg, *args)
    np.testing.assert_allclose(
        np.asarray(single.poses), np.asarray(sharded.poses), atol=1e-5, rtol=1e-5
    )

    # track_reproj through the mesh: the per-step mean trace is the pmean of
    # the equal shards' local means and must match the single-program trace
    # (it used to raise NotImplementedError — VERDICT r4 next #7)
    import dataclasses

    zcfg_tr = dataclasses.replace(
        zcfg, oil=dataclasses.replace(zcfg.oil, track_reproj=True))
    single_tr = pipeline.solve(params, cfg_m, sde, sampler, zcfg_tr, *args)
    sharded_tr = pipeline.solve_sharded(
        mesh, params, cfg_m, sde, sampler, zcfg_tr, *args)
    assert sharded_tr.reproj_px is not None
    assert sharded_tr.reproj_px.shape == (2, 10)  # [S, steps]
    np.testing.assert_allclose(np.asarray(single_tr.reproj_px),
                               np.asarray(sharded_tr.reproj_px),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(single.poses),
                               np.asarray(sharded_tr.poses),
                               atol=1e-5, rtol=1e-5)

    # pad-aware trace (code review r5): pad N=5 real rows up to 8, pass
    # pad_batch's mask as row_mask — the trace must equal the UNPADDED
    # 5-row single-program oracle (pad rows excluded from the mean), not
    # the padded 8-row mean the maskless call reports
    from zedo_tpu.data import sharding as shard_lib

    n_real = 5
    short = (clusters, jnp.asarray(px[:n_real]), None, jnp.asarray(k[:n_real]))
    oracle = pipeline.solve(params, cfg_m, sde, sampler, zcfg_tr, *short)
    padded, mask = shard_lib.pad_batch(
        {"px": px[:n_real], "k": k[:n_real]}, mesh.devices.size)
    pad_args = (clusters, jnp.asarray(padded["px"]), None,
                jnp.asarray(padded["k"]))
    masked = pipeline.solve_sharded(
        mesh, params, cfg_m, sde, sampler, zcfg_tr, *pad_args, row_mask=mask)
    np.testing.assert_allclose(np.asarray(oracle.reproj_px),
                               np.asarray(masked.reproj_px),
                               atol=1e-4, rtol=1e-5)
    unmasked = pipeline.solve_sharded(
        mesh, params, cfg_m, sde, sampler, zcfg_tr, *pad_args)
    assert not np.allclose(np.asarray(oracle.reproj_px),
                           np.asarray(unmasked.reproj_px), atol=1e-6)
    # poses are unaffected by the weighting
    np.testing.assert_allclose(
        np.asarray(oracle.poses),
        shard_lib.unpad(np.asarray(masked.poses), mask), atol=1e-5, rtol=1e-5)


def test_auto_tile_minimizes_padding():
    """pallas_tile=None picks the padding-minimal tile (largest on ties):
    the per-vmap-slice batch N=886 padded 15% at the old fixed 256 but 1% at
    128 (measured 3.25s -> 2.95s on the headline eval)."""
    cases = {886: 128, 44544: 512, 1024: 512, 896: 128, 256: 256,
             1716: 256, 5: 128}
    for b, want in cases.items():
        got = oil_lib._auto_tile(b)
        assert got == want, (b, got, want)
        # chosen tile never pads worse than any candidate
        pad = lambda t: -(-b // t) * t
        assert pad(got) == min(pad(t) for t in (512, 256, 128))


def test_oil_score_reuse(rng):
    """score_reuse=1 is exact; k=2 halves NFE and stays close on a smooth
    score field."""
    import dataclasses

    k, pose, t_true, px = _scene(rng, n=4)
    cfg_m, _, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    x0 = (pose + 0.05).astype(np.float32)
    base_cfg = oil_lib.OILConfig(iterations=24, sampling_eps=0.01, fixed_t_steps=8)

    res1 = oil_lib.run_oil(params, cfg_m, sde, sampler, jnp.asarray(x0),
                           jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
                           None, base_cfg)
    res1b = oil_lib.run_oil(params, cfg_m, sde, sampler, jnp.asarray(x0),
                            jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
                            None, dataclasses.replace(base_cfg, score_reuse=1))
    np.testing.assert_array_equal(np.asarray(res1.pose), np.asarray(res1b.pose))

    res2 = oil_lib.run_oil(params, cfg_m, sde, sampler, jnp.asarray(x0),
                           jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
                           None, dataclasses.replace(base_cfg, score_reuse=2))
    d = np.abs(np.asarray(res2.pose) - np.asarray(res1.pose))
    assert np.isfinite(d).all()
    assert d.mean() < 0.05  # close but not identical
    assert d.max() > 0


def test_oil_with_langevin_corrector(rng):
    """Generic registry path: langevin corrector + reverse_diffusion predictor
    through the OIL loop (exotic but registered configurations must run)."""
    k, pose, t_true, px = _scene(rng, n=3)
    cfg_m, _, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="langevin",
                        snr=0.16, n_steps=1, probability_flow=True, denoise=True,
                        eps=0.01)
    assert not oil_lib._fast_supported(sde, sampler)
    cfg = oil_lib.OILConfig(iterations=8, sampling_eps=0.01, fixed_t_steps=4)
    res = oil_lib.run_oil(params, cfg_m, sde, sampler, jnp.asarray(pose + 0.05),
                          jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
                          None, cfg, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res.pose)).all()


def test_oil_reproj_trace_decreases(rng):
    """OILConfig.track_reproj carries the per-step mean pixel reprojection
    error out of the scan (the reference's per-iteration `projection_error`
    log, opt_main_infant.py:306-308); on a consistent synthetic scene the
    trace decreases as OIL pulls the pose onto the camera rays."""
    k, pose, t_true, px = _scene(rng, n=5)
    cfg_m, _, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    x0 = (pose + rng.randn(*pose.shape).astype(np.float32) * 0.1).astype(np.float32)
    cfg = oil_lib.OILConfig(iterations=30, sampling_eps=0.01,
                            track_reproj=True)

    res = oil_lib.run_oil(
        params, cfg_m, sde, sampler,
        jnp.asarray(x0), jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
        None, cfg,
    )
    trace = np.asarray(res.reproj_px)
    assert trace.shape == (30,)
    assert np.isfinite(trace).all() and (trace > 0).all()
    # monotone-ish: the endpoint is well below the start, and the second
    # half is uniformly below the first recorded error
    assert trace[-1] < 0.5 * trace[0]
    assert (trace[15:] < trace[0]).all()

    # the generic path carries the same trace
    gen_sampler = PCSampler(sde=sde, predictor="reverse_diffusion",
                            corrector="none", probability_flow=True,
                            denoise=True, eps=0.01)
    res_g = oil_lib.run_oil(
        params, cfg_m, sde, gen_sampler,
        jnp.asarray(x0), jnp.asarray(t_true), jnp.asarray(px), jnp.asarray(k),
        None, cfg,
    )
    trace_g = np.asarray(res_g.reproj_px)
    assert trace_g.shape == (30,) and np.isfinite(trace_g).all()
    assert trace_g[-1] < 0.5 * trace_g[0]


def test_oil_score_reuse_generic_path(rng):
    """score_reuse on the GENERIC registry path (VERDICT r4 next #5):

    (a) at reuse=2 the generic EM-PF path matches the fast path's reuse=2
        exactly (both carry the raw network output and refresh the std each
        step — split_score_fn is the fast path's decomposition);
    (b) a ControlNet adapter model — which can only take the generic path —
        gets the NFE knob, with a bounded deviation from its own exact
        dynamics (the characterization gate the fast path shipped with);
    (c) reuse=1 on the generic path is unchanged (no frozen-output carry).
    """
    import dataclasses

    from zedo_tpu.models import control_mlp

    k, pose, t_true, px = _scene(rng, n=4)
    cfg_m, _, params = _tiny_model_and_params()
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    x0 = (pose + 0.05).astype(np.float32)
    base_cfg = oil_lib.OILConfig(iterations=12, sampling_eps=0.01, fixed_t_steps=5)

    def run(sampler, oil_cfg, prm=params, model_apply=None):
        return np.asarray(oil_lib.run_oil(
            prm, cfg_m, sde, sampler, jnp.asarray(x0), jnp.asarray(t_true),
            jnp.asarray(px), jnp.asarray(k), None, oil_cfg,
            rng=jax.random.PRNGKey(0), model_apply=model_apply).pose)

    fast = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                     probability_flow=True, denoise=True, eps=0.01)
    generic = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=False, eps=0.01)
    assert oil_lib._fast_supported(sde, fast)
    assert not oil_lib._fast_supported(sde, generic)

    # (a) fast reuse-2 == generic reuse-2 (PF makes denoise a no-op)
    cfg2 = dataclasses.replace(base_cfg, score_reuse=2)
    np.testing.assert_allclose(run(fast, cfg2), run(generic, cfg2),
                               atol=1e-4, rtol=1e-3)

    # (c) reuse=1 generic still matches fast exactly (unchanged behavior)
    np.testing.assert_allclose(run(fast, base_cfg), run(generic, base_cfg),
                               atol=1e-4, rtol=1e-3)

    # (b) adapter model: reuse-2 bounded against its own exact dynamics
    ctrl_params = control_mlp.init_params(jax.random.PRNGKey(1), cfg_m)
    exact = run(fast, base_cfg, prm=ctrl_params, model_apply=control_mlp.apply)
    reused = run(fast, cfg2, prm=ctrl_params, model_apply=control_mlp.apply)
    d = np.abs(exact - reused)
    assert np.isfinite(d).all()
    assert d.mean() < 0.05  # same bound as the fast-path characterization
    # and the adapter really took the generic path with reuse accepted
    # (before r5 this raised NotImplementedError)
