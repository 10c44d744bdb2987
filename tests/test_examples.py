"""examples/quickstart.py must stay runnable on a fresh clone (it is the
first thing a migrating user executes; README points at it)."""
import os
import re
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def test_quickstart_runs_and_beats_init():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               ZEDO_COMPILATION_CACHE="off")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "quickstart.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    m = re.search(r"solved MPJPE (\d+\.\d+) mm", proc.stdout)
    assert m, proc.stdout
    # the committed fixture solves to ~33 mm; generous backend headroom
    assert float(m.group(1)) < 80.0, proc.stdout
    assert "ZeDOEstimator.low_latency()" in proc.stdout
