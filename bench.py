"""Headline benchmark: full H36M-scale zero-shot eval on real hardware.

Workload (BASELINE.md): N=886 poses x S=50 hypotheses, 500 IPO Adam steps +
1000 OIL steps (each OIL step = translation solve + ray gradient + one
score-network forward on [N*S, 51] -> 1024-wide residual MLP). Synthetic
inputs, random weights — identical compute to a trained checkpoint.

Prints one JSON line:
  {"metric": "h36m_s50_eval_wallclock", "value": <s>, "unit": "s",
   "vs_baseline": <60/s>}
vs_baseline > 1 beats the driver's v4-8 <60s target (BASELINE.json). The
reference implementation has no published speed numbers (SURVEY §6); its
architecture does 44.3M sequential host-roundtrip sampler calls' worth of
work per run (S x 1000 steps, numpy<->GPU each step).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_inputs(n=886, s=50, j=17, seed=0):
    rng = np.random.RandomState(seed)
    k = np.zeros((n, 3, 3), np.float32)
    k[:, 0, 0] = k[:, 1, 1] = 1145.0
    k[:, 0, 2] = k[:, 1, 2] = 512.0
    k[:, 2, 2] = 1.0
    pose = rng.randn(n, j, 3).astype(np.float32) * 0.25
    pose -= pose[:, 0:1]
    t = np.zeros((n, 1, 3), np.float32)
    t[..., 2] = 4.5
    cam = pose + t
    px = np.einsum("bij,bnj->bni", k, cam)
    px = (px[..., :2] / px[..., 2:]).astype(np.float32)
    conf = np.clip(rng.rand(n, j).astype(np.float32) + 0.3, 0, 1)
    clusters = (rng.randn(s, j, 3) * 0.25).astype(np.float32)
    return px, conf, k, clusters


def run_trained(n, s):
    """--trained: accuracy bounds on the committed trained checkpoint at the
    requested shape (tests/fixtures/trained; VERDICT r4 weak #1 — the bf16
    and score_reuse claims re-verified on trained weight statistics)."""
    import time as _time

    from zedo_tpu import bench_trained

    t0 = _time.time()
    out = bench_trained.run_trained_bounds(n=n, s=s)
    out["wallclock_5_solves_s"] = round(_time.time() - t0, 3)
    import jax

    result = {
        "metric": f"trained_accuracy_n{n}_s{s}",
        "value": round(out["fp32_mpjpe_mm"], 3),
        "unit": "mm",
        # gate ratio: trained-prior error as a fraction of the cluster-init
        # error (smaller = better; BASELINE has no trained-accuracy target)
        "vs_baseline": round(out["init_mm"] / out["fp32_mpjpe_mm"], 3),
        "extras": {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in out.items()}
        | {"device_kind": jax.devices()[0].device_kind,
           "checkpoint": "tests/fixtures/trained (hidden 256, 3000 steps)"},
    }
    print(json.dumps(result))


# bf16 MXU peak FLOP/s per chip, by device_kind substring (public TPU specs;
# used only to turn achieved model-FLOP/s into an MFU fraction). Unknown
# device kinds get model_tflops but mfu=None.
_BF16_PEAK_BY_KIND = (
    ("v6", 918e12),  # v6e / Trillium
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # v5e
    ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def _bf16_peak(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for sub, peak in _BF16_PEAK_BY_KIND:
        if sub in kind:
            return peak
    return None


def main():
    from zedo_tpu.utils.config import cli_int_arg, enable_compilation_cache

    cache_dir = enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    # relay health probe: backend init + one tiny host->device->host
    # round-trip. On the axon relay this latency is the environment-dependent
    # part of cold start (measured 0.5 s to minutes across sessions) — with
    # cache_entries_written == 0 below, any first-run excess is THIS, not
    # compilation.
    t0 = time.time()
    probe = float(np.asarray(jax.device_get(jax.device_put(np.ones(4)))).sum())
    assert probe == 4.0
    device_probe_s = time.time() - t0

    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp
    from zedo_tpu.parallel.mesh import default_mesh
    from zedo_tpu.zeroshot import pipeline

    # --n 1716 = the largest published split (Ski, configs/optim/
    # concat_pose_optimization_ski.py:79-80); default = the H36M headline
    n, s = cli_int_arg(sys.argv, "--n", 886), cli_int_arg(sys.argv, "--s", 50)
    if "--trained" in sys.argv:
        return run_trained(n, s)
    # default = the flagship config: bf16 weights + fused pallas score kernel
    dtype = "fp32" if "--fp32" in sys.argv else "bf16"
    px, conf, k, clusters = build_inputs(n=n, s=s)

    cfg_m = score_mlp.ScoreMLPConfig()
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg_m)
    if dtype == "bf16":
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST

    reuse = cli_int_arg(sys.argv, "--reuse", 1)  # opt-in NFE reduction (OILConfig.score_reuse)
    tile = cli_int_arg(sys.argv, "--tile", 0)  # 0 = OILConfig default
    # opt-in re-discretized short schedule (serving.with_schedule semantics:
    # sde.n := iterations so dt = 1/iterations, preserving total prior
    # contraction; characterized +0.4mm at 200 steps on the trained fixture
    # — DESIGN.md "Low-latency serving"). Reachable on the CLIs via
    # --override ZeDO.OIL_iterations=200 model.num_scales=200.
    oil_iters = cli_int_arg(sys.argv, "--oil", 0) or 1000  # 1000 = exact

    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=oil_iters, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig()  # 500 IPO / 1000 OIL, h36m keylist
    if reuse > 1 or tile or oil_iters != 1000:
        import dataclasses

        oil_kw = {}
        if reuse > 1:
            oil_kw["score_reuse"] = reuse
        if tile:
            oil_kw["pallas_tile"] = tile
        if oil_iters != 1000:
            oil_kw["iterations"] = oil_iters
        zcfg = dataclasses.replace(
            zcfg, oil=dataclasses.replace(zcfg.oil, **oil_kw))

    mesh = default_mesh()
    # shard_map needs N divisible by the device count (pad-and-mask like the
    # CLI does; padded rows are replicas of the last pose)
    from zedo_tpu.data.sharding import pad_batch

    padded, _mask = pad_batch({"px": px, "conf": conf, "k": k}, mesh.devices.size)
    args = (
        jnp.asarray(clusters), jnp.asarray(padded["px"]),
        jnp.asarray(padded["conf"]), jnp.asarray(padded["k"]),
    )

    def run(seed):
        # vary the rng so no caching layer can alias runs; materialize a
        # host-side scalar to force full completion (block_until_ready is
        # not reliable on the experimental axon platform)
        out = pipeline.solve_sharded(
            mesh, params, cfg_m, sde, sampler, zcfg, *args,
            rng=jax.random.PRNGKey(seed), precision=precision,
        )
        checksum = float(jnp.sum(out.poses))
        return out, checksum

    import os

    pre_entries = (set(os.listdir(cache_dir)) if cache_dir else set())
    t0 = time.time()
    _, checksum0 = run(0)  # compile + first run
    compile_and_first = time.time() - t0
    # 0 new entries = the precompiled artifact cache fully served the run
    # (artifacts/xla_cache, DESIGN.md "Cold start")
    new_entries = (len(set(os.listdir(cache_dir)) - pre_entries)
                   if cache_dir else -1)

    t0 = time.time()
    out, checksum = run(1)
    elapsed = time.time() - t0
    assert np.isfinite(checksum), checksum

    # MFU accounting (VERDICT r4 weak #3): achieved model-FLOP/s over the
    # steady-state run, from the kernel's analytic per-eval FLOPs
    # (score_kernel.analytic_fwd_flops — same formula as its cost_estimate)
    # x the number of score evals the scan actually executes
    # (ceil(OIL_iterations / score_reuse), oil.py eval_mask), vs the bf16
    # MXU peak of this device kind. The basis is the kernel-analytic count
    # (lane-padded io + GN indicator matmuls — the MXU work the kernel
    # issues) on n*s rows; IPO/geometry/sampler arithmetic is excluded, so
    # the denominator (full pipeline wall-clock) makes this a lower bound
    # on the score phase's own utilization.
    from zedo_tpu.ops.pallas import score_kernel

    n_evals = -(-zcfg.oil.iterations // reuse)  # ceil
    flops_per_eval = score_kernel.analytic_fwd_flops(n * s, cfg_m)
    model_flops = n_evals * flops_per_eval
    achieved = model_flops / elapsed
    peak = _bf16_peak(jax.devices()[0].device_kind)
    n_dev = len(jax.devices())
    mfu = (achieved / (peak * n_dev) if (peak and dtype == "bf16") else None)

    metric = ("h36m_s50_eval_wallclock" if (n, s) == (886, 50)
              else f"eval_wallclock_n{n}_s{s}")
    if reuse > 1:
        # NFE-reduced runs must be unmistakable from the exact-dynamics
        # headline (score_reuse costs a characterized +0.1mm)
        metric += f"_reuse{reuse}"
    if oil_iters != 1000:
        # short-schedule runs likewise (+0.4mm at 200 steps, DESIGN.md)
        metric += f"_oil{oil_iters}"
    # the 60s target is defined for the (886, 50) H36M workload
    # (BASELINE.json); other shapes compare against a rate-scaled target
    target_s = 60.0 * (n * s) / (886 * 50)
    result = {
        "metric": metric,
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(target_s / elapsed, 3),
        "extras": {
            "poses_per_s": round(n * s / elapsed, 1),
            "compile_plus_first_run_s": round(compile_and_first, 3),
            "dtype": dtype,
            "devices": len(jax.devices()),
            "device_kind": jax.devices()[0].device_kind,
            "compilation_cache": cache_dir or "disabled",
            "cache_entries_written": new_entries,
            "device_probe_s": round(device_probe_s, 3),
            "score_reuse": reuse,
            "pallas_tile": tile or "auto",
            "nfe": n_evals,
            "model_tflops": round(achieved / 1e12, 4),
            "bf16_peak_tflops": (round(peak / 1e12, 1) if peak else None),
            "mfu": (round(mfu, 4) if mfu is not None else None),
            "flops_basis": "kernel-analytic (score_kernel cost_estimate), "
                           "full-pipeline wallclock denominator",
        },
    }
    print(json.dumps(result))


def _watchdog() -> int:
    """Re-exec the bench as a supervised child, retrying on a hang.

    The axon relay occasionally wedges during backend init (observed: the
    xla_bridge banner prints, then the device probe never returns — while an
    immediate retry in a fresh process succeeds). A hung run produces NO
    output, so retrying is always safe for the one-JSON-line contract: the
    child inherits stdout and only a successful run prints the line.
    ZEDO_BENCH_WATCHDOG=off disables (direct main() call, old behavior);
    per-attempt timeout / attempt count via ZEDO_BENCH_TIMEOUT_S /
    ZEDO_BENCH_ATTEMPTS.
    """
    import os
    import signal
    import subprocess

    timeout_s = int(os.environ.get("ZEDO_BENCH_TIMEOUT_S", "900"))
    attempts = int(os.environ.get("ZEDO_BENCH_ATTEMPTS", "3"))
    env = dict(os.environ, _ZEDO_BENCH_CHILD="1")
    child = None

    def _forward(signum, _frame):
        # a supervising timeout killing THIS process must never orphan the
        # child — a leftover jax process wedges the single-tenant TPU relay
        # for every later run
        if child is not None and child.poll() is None:
            child.kill()
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)

    rc = 1
    for i in range(attempts):
        child = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), *sys.argv[1:]],
            env=env,
        )
        try:
            rc = child.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()
            print(f"bench attempt {i + 1}/{attempts} hung >{timeout_s}s "
                  f"(relay wedged at init?); retrying in a fresh process",
                  file=sys.stderr)
            rc = 124
            continue
        if rc == 0:
            return 0
        print(f"bench attempt {i + 1}/{attempts} exited rc={rc}",
              file=sys.stderr)
    return rc


if __name__ == "__main__":
    import os

    if (os.environ.get("ZEDO_BENCH_WATCHDOG", "").lower() == "off"
            or os.environ.get("_ZEDO_BENCH_CHILD")):
        main()
    else:
        sys.exit(_watchdog())
