"""Serving API: load once, predict many times.

The CLIs are batch-evaluation tools; production serving wants a persistent
object that pays checkpoint load + compilation once and then answers
`predict(keypoints_2d, K)` calls at device speed. Compiled executables are
cached per input shape (pad-to-bucket to bound recompiles).

    est = ZeDOEstimator.from_torch_checkpoint(
        "checkpoint_1500.pth", "clusters/h36m_cluster5.npy",
        config_path="configs/optim/concat_pose_optimization_h36m.py",
        dtype="bf16")
    poses = est.predict(kp2d, K)            # [N, S, 17, 3] + min-index
"""
from __future__ import annotations

import dataclasses
import importlib.util
from typing import Optional

import numpy as np


def _rank_and_pack_impl(poses, trans, kp2d, k):
    """On-device hypothesis ranking + single-buffer packing.

    The serving-latency profile on the remote-relay TPU is dominated by
    device->host round-trips (~30-40 ms each), not compute: fetching poses,
    translations, and the reprojection ranking separately costs 3-4 trips
    (~110 ms fixed). This computes the reprojection error [N, S] on device
    and concatenates everything into ONE flat f32 buffer so predict() pays
    exactly one transfer."""
    import jax.numpy as jnp

    from zedo_tpu.ops.camera import project

    n = poses.shape[0]
    cam = poses + trans  # [N, S, j, 3]
    proj = project(cam, k[:, None])
    err = jnp.abs(proj - kp2d[:, None, :, :2]).mean(axis=(2, 3))  # [N, S]
    return jnp.concatenate(
        [poses.reshape(n, -1).astype(jnp.float32),
         trans.reshape(n, -1).astype(jnp.float32),
         err.astype(jnp.float32)], axis=1)


_rank_and_pack = None  # jitted lazily (jax import deferred at module load)


def _get_rank_and_pack():
    """One module-level jitted instance: a fresh jax.jit per predict() call
    would re-trace every request (each wrapper owns its own cache)."""
    global _rank_and_pack
    if _rank_and_pack is None:
        import jax

        _rank_and_pack = jax.jit(_rank_and_pack_impl)
    return _rank_and_pack


def _load_config(config_path: str):
    spec = importlib.util.spec_from_file_location("zedo_serving_config", config_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


@dataclasses.dataclass
class ZeDOEstimator:
    params: dict
    model_cfg: object
    sde: object
    sampler: object
    zcfg: object
    clusters: np.ndarray  # [S, j, 3]
    precision: object
    batch_bucket: int = 256  # pad N up to a multiple to bound recompiles
    seed: int = 0
    # jax.sharding.Mesh for multi-chip serving: the padded batch is sharded
    # over the mesh's 'data' axis (pipeline.solve_sharded — collective-free,
    # so request latency is flat and throughput scales with chips). Also
    # accepts a mesh_from_spec string ('auto', 'off', 'dpN', ...). None =
    # single-program
    mesh: object = None

    def __post_init__(self):
        # validate on EVERY construction path, not just from_torch_checkpoint
        # — a direct ZeDOEstimator(...) with a bad mesh would otherwise fail
        # later inside solve_sharded with an opaque shard_map/padding error
        # (advisor r4)
        if isinstance(self.mesh, str):
            from zedo_tpu.parallel.mesh import mesh_from_spec

            self.mesh = mesh_from_spec(self.mesh)
        if self.mesh is not None:
            if "data" not in self.mesh.axis_names:
                raise ValueError(
                    f"serving mesh needs a 'data' axis, got {self.mesh.axis_names}")
            n_data = self.mesh.shape["data"]
            if self.batch_bucket % n_data:
                raise ValueError(
                    f"batch_bucket {self.batch_bucket} must be divisible by "
                    f"the mesh data-axis size {n_data}")

    @classmethod
    def from_torch_checkpoint(
        cls,
        ckpt_path: str,
        cluster_path: str,
        config_path: str = "configs/optim/concat_pose_optimization_h36m.py",
        hypo: Optional[int] = None,
        dtype: str = "bf16",
        use_ema: bool = False,
        batch_bucket: int = 256,
        mesh: object = None,
    ) -> "ZeDOEstimator":
        """mesh: a jax.sharding.Mesh with a 'data' axis, or 'auto' (build a
        data mesh over all devices when >1), or None (single-program). The
        batch bucket must be divisible by the data-axis size."""
        from zedo_tpu.utils.config import enable_compilation_cache

        enable_compilation_cache()
        import jax
        import jax.numpy as jnp

        from zedo_tpu.diffusion.sampling import get_sampling_fn
        from zedo_tpu.diffusion.sde import build_sde
        from zedo_tpu.models.registry import make_mlp_config
        from zedo_tpu.utils.checkpoint import convert_cluster_file, load_any_checkpoint
        from zedo_tpu.zeroshot import pipeline

        config = _load_config(config_path)
        model_cfg = make_mlp_config(config)
        params, _step = load_any_checkpoint(ckpt_path, model_cfg, use_ema=use_ema)
        if dtype == "bf16":
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            precision = None
        else:
            precision = jax.lax.Precision.HIGHEST

        clusters = np.asarray(convert_cluster_file(cluster_path), np.float32)
        if hypo is not None:
            clusters = clusters[:hypo]
        sde = build_sde(
            config.training.sde,
            beta_min=config.model.beta_min, beta_max=config.model.beta_max,
            sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max,
            n=config.model.num_scales, t_max=config.model.t,
        )
        config.sampling.probability_flow = True
        sampler = get_sampling_fn(
            config, sde, (batch_bucket, model_cfg.n_joints, model_cfg.joint_dim),
            lambda x: x, config.ZeDO.sampling_eps,
        )
        zcfg = pipeline.ZeDOConfig.from_config(config)
        # mesh string resolution + validation live in __post_init__ so every
        # construction path gets them
        return cls(params=params, model_cfg=model_cfg, sde=sde, sampler=sampler,
                   zcfg=zcfg, clusters=clusters, precision=precision,
                   batch_bucket=batch_bucket, mesh=mesh)

    def with_schedule(self, oil_iterations: Optional[int],
                      ipo_iterations: Optional[int] = None,
                      score_reuse: Optional[int] = None) -> "ZeDOEstimator":
        """Short-schedule variant for latency-bound serving.

        Re-discretizes the reverse schedule: the SAME T->eps annealing is
        integrated with `oil_iterations` larger Euler steps (the SDE's step
        count N is set to `oil_iterations`, so dt = 1/iterations — total
        prior contraction is preserved). This is the characterized
        low-latency mode (DESIGN.md "Low-latency serving"): on the trained
        fixture, 1000->200 steps costs +0.4 mm and 1000->100 +1.1 mm
        best-hypothesis MPJPE, while naive truncation (keeping dt = 1/1000)
        diverges (212 mm at 50 steps). Latency scales ~linearly with steps.
        `oil_iterations=None` keeps the current OIL schedule (use to adjust
        only IPO iterations or score_reuse).

        Returns a NEW estimator (compiled executables are cached per
        schedule); the original is untouched.
        """
        if oil_iterations is None:
            sde, sampler = self.sde, self.sampler
            oil_kw = {}
        else:
            sde = dataclasses.replace(self.sde, n=oil_iterations)
            sampler = dataclasses.replace(self.sampler, sde=sde)
            oil_kw = {"iterations": oil_iterations}
        if score_reuse is not None:
            oil_kw["score_reuse"] = score_reuse
        zcfg = dataclasses.replace(
            self.zcfg,
            ipo=(self.zcfg.ipo if ipo_iterations is None else
                 dataclasses.replace(self.zcfg.ipo,
                                     iterations=ipo_iterations)),
            oil=(dataclasses.replace(self.zcfg.oil, **oil_kw)
                 if oil_kw else self.zcfg.oil),
        )
        return dataclasses.replace(self, sde=sde, sampler=sampler, zcfg=zcfg)

    def low_latency(self) -> "ZeDOEstimator":
        """The characterized low-latency preset: OIL 200 (re-discretized),
        IPO 100 — +0.4 mm on the trained fixture vs the full 1000/500
        schedule, ~5x fewer sequential steps (p50 <= 100 ms at N <= 32 on
        v5e, tools/bench_serving.py --oil 200 --ipo 100)."""
        return self.with_schedule(200, ipo_iterations=100)

    def predict(self, keypoints_2d: np.ndarray, k: np.ndarray,
                confidence: Optional[np.ndarray] = None):
        """keypoints_2d [N, j, 2], k [N, 3, 3], confidence [N, j] or None
        -> dict(poses [N, S, j, 3], translations [N, S, 1, 3],
                best [N] argmin-reprojection hypothesis index)."""
        import jax
        import jax.numpy as jnp

        from zedo_tpu.data.sharding import pad_batch, unpad
        from zedo_tpu.zeroshot import pipeline

        n = len(keypoints_2d)
        padded, mask = pad_batch(
            {"kp": np.asarray(keypoints_2d, np.float32),
             "k": np.asarray(k, np.float32),
             "conf": None if confidence is None else np.asarray(confidence, np.float32)},
            self.batch_bucket,
        )
        if self.mesh is not None:
            # place batch buffers on the mesh sharding HERE, once:
            # solve_sharded's own device_put then sees the target sharding
            # and no-ops, and the rank-and-pack jit reuses the same shards —
            # one host->device transfer per buffer instead of two (each
            # costs ~30-40 ms over the remote relay)
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(self.mesh, P("data"))
            put = lambda a: jax.device_put(a, batch_sh)
        else:
            put = jnp.asarray
        kp_dev, k_dev = put(padded["kp"]), put(padded["k"])
        common = (
            self.params, self.model_cfg, self.sde, self.sampler, self.zcfg,
            jnp.asarray(self.clusters), kp_dev,
            None if padded["conf"] is None else put(padded["conf"]),
            k_dev,
        )
        kwargs = dict(rng=jax.random.PRNGKey(self.seed), precision=self.precision)
        if self.mesh is not None:
            result = pipeline.solve_sharded(self.mesh, *common, **kwargs)
        else:
            result = pipeline.solve_jit(*common, **kwargs)
        # rank hypotheses by reprojection error ON DEVICE (no GT at serving
        # time) and fetch one packed buffer — a single device->host
        # round-trip instead of 3-4 (each costs ~30-40 ms over the remote
        # relay). On a mesh the pack jit runs under GSPMD on the sharded
        # solve outputs (kp/k replicate automatically); the fetch gathers
        # the shards in one logical transfer.
        packed = _get_rank_and_pack()(
            result.poses, result.translations, kp_dev, k_dev)
        host = unpad(np.asarray(packed), mask)  # [N, S*j*3 + S*3 + S]
        s = len(self.clusters)
        j = self.model_cfg.n_joints
        poses = host[:, :s * j * 3].reshape(n, s, j, 3)
        trans = host[:, s * j * 3:s * j * 3 + s * 3].reshape(n, s, 1, 3)
        err = host[:, s * j * 3 + s * 3:]  # [N, S]
        best = err.argmin(axis=1)
        return {"poses": poses, "translations": trans, "best": best,
                "reprojection_error": err}
