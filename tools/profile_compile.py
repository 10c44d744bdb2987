"""Decompose the flagship program's cold-start cost (VERDICT r2 weak #1).

Measures, for the exact bench.py (886, 50) sharded solve program:
  * import + input-build time,
  * trace+lower time (jax AOT .lower()),
  * backend compile time (.compile() — on axon this includes the remote
    relay round-trip),
  * first-execution time,
for pallas-on (flagship bf16) and pallas-off (bf16, XLA-only) variants.

Run with the compilation cache OFF to see true cold numbers:
  ZEDO_COMPILATION_CACHE=off python tools/profile_compile.py [--no_pallas]
"""
from __future__ import annotations

import json
import sys
import time

t_start = time.time()

import os  # noqa: E402

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import build_inputs
    from zedo_tpu.utils.config import cli_int_arg, enable_compilation_cache

    cache_dir = enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from zedo_tpu.data.sharding import pad_batch
    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp
    from zedo_tpu.parallel.mesh import default_mesh
    from zedo_tpu.zeroshot import pipeline

    n = cli_int_arg(sys.argv, "--n", 886)
    s = cli_int_arg(sys.argv, "--s", 50)
    use_pallas = None if "--no_pallas" not in sys.argv else False
    ipo_iters = cli_int_arg(sys.argv, "--ipo", 0)  # 0 = default (500)
    oil_iters = cli_int_arg(sys.argv, "--oil", 0)  # 0 = default (1000)

    px, conf, k, clusters = build_inputs(n=n, s=s)
    cfg_m = score_mlp.ScoreMLPConfig()
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg_m)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig()
    oil_kw = {}
    if use_pallas is not None:
        oil_kw["use_pallas"] = use_pallas
    if oil_iters:
        oil_kw["iterations"] = oil_iters
    if oil_kw:
        zcfg = dataclasses.replace(zcfg, oil=dataclasses.replace(zcfg.oil, **oil_kw))
    if ipo_iters:
        zcfg = dataclasses.replace(zcfg, ipo=dataclasses.replace(zcfg.ipo, iterations=ipo_iters))

    mesh = default_mesh()
    padded, _ = pad_batch({"px": px, "conf": conf, "k": k}, mesh.devices.size)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    cond2d = jax.device_put(jnp.asarray(padded["px"]), bsh)
    kk = jax.device_put(jnp.asarray(padded["k"]), bsh)
    cc = jax.device_put(jnp.asarray(padded["conf"]), bsh)
    pp = jax.device_put(params, repl)
    cl = jax.device_put(jnp.asarray(clusters), repl)
    rng = jax.random.PRNGKey(0)
    t_setup = time.time()

    fn = pipeline._sharded_solve_fn(
        mesh, "data", True, False, cfg_m, sde, sampler, zcfg, None
    )
    lowered = fn.lower(pp, cl, cond2d, cc, kk, rng)
    t_lower = time.time()
    compiled = lowered.compile()
    t_compile = time.time()
    out = compiled(pp, cl, cond2d, cc, kk, rng)
    checksum = float(jnp.sum(out.poses))
    t_first = time.time()
    out = compiled(pp, cl, cond2d, cc, kk, rng)
    checksum2 = float(jnp.sum(out.poses))
    t_second = time.time()
    assert np.isfinite(checksum) and np.isfinite(checksum2)
    # HLO text serialization is measurable for this program — keep it out of
    # every timed window (it inflated backend_compile_s before)
    hlo_lines = lowered.as_text().count("\n")

    print(json.dumps({
        "variant": "pallas_off" if use_pallas is False else "pallas_auto",
        "n": n, "s": s,
        "import_and_inputs_s": round(t_setup - t_start, 2),
        "trace_lower_s": round(t_lower - t_setup, 2),
        "backend_compile_s": round(t_compile - t_lower, 2),
        "first_exec_s": round(t_first - t_compile, 2),
        "second_exec_s": round(t_second - t_first, 2),
        "total_s": round(t_second - t_start, 2),
        "hlo_lines": hlo_lines,
        "cache": cache_dir or "off",
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
