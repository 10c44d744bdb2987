"""Regenerate the in-repo precompiled-executable cache (artifacts/xla_cache).

Runs the flagship bench program (H36M 886x50, bf16, fused kernel) against a
scratch compilation-cache dir on the real TPU, then copies the resulting
entries into artifacts/xla_cache for `enable_compilation_cache` to seed onto
fresh hosts (utils/config.py). Re-run after ANY change that alters the traced
solve program (oil/pipeline/kernel/model code, bench shapes) — stale entries
are harmless (key mismatch -> normal compile) but useless.

Usage:  python tools/warm_cache.py [--flagship-only]
  Default captures ALL committed shapes — flagship + Ski (--n 1716) +
  --reuse 2 + the low-latency serving preset (bench_serving --oil 200
  --ipo 100 --bucket 32, the ZeDOEstimator.low_latency programs) — because
  regeneration PURGES the artifact dir first: a flagship-only run would
  silently discard the committed secondary-shape executables and fresh
  hosts would pay the 5-60s relay compile for them.
  --flagship-only opts into the faster single-program capture.
  Each run is bounded by ZEDO_WARM_TIMEOUT_S (default 2400 s); a wedged
  relay aborts the regeneration loudly with the existing artifacts intact.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = os.path.join(REPO, "artifacts", "xla_cache")


def main():
    scratch = tempfile.mkdtemp(prefix="zedo_warm_cache_")
    env = dict(os.environ)
    env["ZEDO_COMPILATION_CACHE"] = scratch
    # regeneration must start from an EMPTY cache: without this, bench would
    # seed the scratch dir from the existing artifacts and stale entries
    # would survive the purge below
    env["ZEDO_CACHE_SEED"] = "off"
    runs = [("bench.py", [])]
    if "--flagship-only" not in sys.argv:
        runs += [("bench.py", ["--n", "1716"]), ("bench.py", ["--reuse", "2"]),
                 # short-schedule frontier (DESIGN.md "Low-latency serving")
                 ("bench.py", ["--oil", "200"]),
                 ("bench.py", ["--oil", "200", "--reuse", "2"]),
                 # trained-accuracy gate programs (hidden-256 fixture)
                 ("bench.py", ["--trained"]),
                 # ZeDOEstimator.low_latency serving programs (p50 45-48 ms
                 # preset): one rep per request size is enough to compile
                 ("tools/bench_serving.py",
                  ["--oil", "200", "--ipo", "100", "--bucket", "32",
                   "--reps", "1"])]
    # per-run deadline: a wedged relay must fail the regeneration loudly
    # (keeping the existing artifacts) instead of hanging it forever.
    # bench.py additionally self-supervises its own init (its watchdog);
    # this bounds the non-bench runs (bench_serving) and compile storms.
    run_timeout_s = int(os.environ.get("ZEDO_WARM_TIMEOUT_S", "2400"))
    for script, extra in runs:
        print(f"running {script} {' '.join(extra) or '(flagship)'} "
              f"against scratch cache {scratch} ...")
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, script), *extra],
            env=env, cwd=REPO,
        )
        try:
            rc = proc.wait(timeout=run_timeout_s)
        except subprocess.TimeoutExpired:
            # SIGTERM first: bench.py's watchdog forwards it to its child,
            # so no jax process is orphaned against the single-tenant relay
            # (SIGKILL would bypass that handler)
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            raise SystemExit(
                f"{script} {extra} exceeded {run_timeout_s}s "
                f"(ZEDO_WARM_TIMEOUT_S; relay wedged?); cache not updated")
        if rc != 0:
            raise SystemExit(
                f"{script} {extra} failed rc={rc}; cache not updated")

    captured = sorted(os.listdir(scratch))
    if not any(n.startswith("jit_shard_fn") for n in captured):
        raise SystemExit(
            "scratch cache has no jit_shard_fn entry (backend could not "
            "serialize executables?); keeping the existing artifacts"
        )
    os.makedirs(ARTIFACTS, exist_ok=True)
    for name in os.listdir(ARTIFACTS):
        os.remove(os.path.join(ARTIFACTS, name))
    n = 0
    total = 0
    for name in captured:
        src = os.path.join(scratch, name)
        shutil.copy2(src, os.path.join(ARTIFACTS, name))
        n += 1
        total += os.path.getsize(src)
    print(f"captured {n} cache entries ({total / 1e6:.1f} MB) -> {ARTIFACTS}")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
