"""bench.py watchdog: the driver-facing resilience wrapper.

The axon relay occasionally wedges during backend init (the xla_bridge banner
prints, then the device probe never returns, while an immediate retry in a
fresh process succeeds). bench.py therefore re-execs itself as a supervised
child with a per-attempt timeout. These tests exercise the supervisor's two
failure paths hermetically on CPU — no TPU, no relay:

- timeout path: a 1-second budget is shorter than a real `import jax`, so the
  child genuinely hangs past the deadline and the supervisor must kill it and
  retry, exiting 124 after the attempts are exhausted;
- signal path: a supervising `timeout`/driver SIGTERM against the watchdog
  must never orphan the child (a leftover jax process wedges the
  single-tenant TPU relay for every later run).
"""
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")

# hermetic: disable the axon PJRT hook (sitecustomize registers it eagerly
# when PALLAS_AXON_POOL_IPS is set, overriding JAX_PLATFORMS=cpu)
CPU_ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")


def test_watchdog_retries_then_reports_timeout():
    env = dict(CPU_ENV, ZEDO_BENCH_TIMEOUT_S="1", ZEDO_BENCH_ATTEMPTS="2")
    proc = subprocess.run(
        [sys.executable, BENCH, "--n", "4", "--s", "2"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 124, (proc.returncode, proc.stderr)
    assert proc.stderr.count("hung >1s") == 2, proc.stderr
    # a hung attempt must not emit the one-JSON-line contract
    assert proc.stdout.strip() == "", proc.stdout


def test_warm_cache_timeout_aborts_without_touching_artifacts():
    """tools/warm_cache.py must fail loudly on a wedged run (per-run
    ZEDO_WARM_TIMEOUT_S deadline), leave artifacts/xla_cache untouched, and
    leave no orphaned bench process behind."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    artifacts = os.path.join(repo, "artifacts", "xla_cache")
    before = sorted(os.listdir(artifacts)) if os.path.isdir(artifacts) else None

    env = dict(CPU_ENV, ZEDO_WARM_TIMEOUT_S="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "warm_cache.py"),
         "--flagship-only"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "exceeded 1s" in proc.stderr and "cache not updated" in proc.stderr
    after = sorted(os.listdir(artifacts)) if os.path.isdir(artifacts) else None
    assert after == before, "a timed-out regeneration touched the artifacts"


def test_watchdog_sigterm_does_not_orphan_child():
    env = dict(CPU_ENV, ZEDO_BENCH_TIMEOUT_S="600", ZEDO_BENCH_ATTEMPTS="1")
    parent = subprocess.Popen(
        [sys.executable, BENCH, "--n", "4", "--s", "2"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # wait for the supervisor to spawn its child
        child_pid = None
        deadline = time.time() + 30
        while time.time() < deadline and child_pid is None:
            try:
                with open(f"/proc/{parent.pid}/task/{parent.pid}/children") as f:
                    kids = f.read().split()
            except FileNotFoundError:
                break
            if kids:
                child_pid = int(kids[0])
            else:
                time.sleep(0.1)
        assert child_pid is not None, "supervisor never spawned a child"

        parent.send_signal(signal.SIGTERM)
        assert parent.wait(timeout=30) == 128 + signal.SIGTERM

        # the child must be gone (no zombie jax process left to wedge the
        # single-tenant relay); give the kernel a beat to reap
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                os.kill(child_pid, 0)
            except ProcessLookupError:
                break
            time.sleep(0.1)
        else:
            raise AssertionError(f"child {child_pid} still alive after SIGTERM")
    finally:
        if parent.poll() is None:
            parent.kill()
            parent.wait()
