"""Two-process (multi-host analogue) evidence runners.

The reference imports torch DDP / torch.distributed but never initializes
them (`/root/reference/run/train_pose_mini.py:18-33` — vestigial). The
zedo_tpu replacement is `parallel.mesh.init_distributed`
(jax.distributed.initialize) + GSPMD over a global mesh; this module holds
the executable proof: child scripts that launch TWO coordinated processes
(4 virtual CPU devices each, Gloo cross-process backend — the CPU analogue
of a 2-host DCN launch) and run

  * the sharded TRAIN step with its cross-process gradient all-reduce,
    asserting both replicas stay bit-identical, and
  * the headline sharded EVAL solve (pipeline.solve_sharded), asserting
    both processes see one identical global result that matches a
    single-process solve of the same scene.

Used by tests/test_distributed.py (pytest) and by
`__graft_entry__.dryrun_multichip` (driver-visible MULTICHIP artifact).
"""
from __future__ import annotations

import os
import subprocess
import sys

__all__ = [
    "CHILD_TRAIN",
    "CHILD_SOLVE",
    "run_two_process",
    "two_process_evidence",
]


def free_port() -> int:
    """Ephemeral port for the coordinator (hard-coding flakes when two test
    sessions share a machine)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


CHILD_TRAIN = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from zedo_tpu.parallel import mesh as mesh_lib
mesh_lib.init_distributed(coordinator_address="localhost:" + port,
                          num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
import ml_collections
from jax.sharding import NamedSharding, PartitionSpec as P
from zedo_tpu.diffusion import losses as losses_lib
from zedo_tpu.diffusion.sde import SubVPSDE
from zedo_tpu.models import score_mlp
from zedo_tpu.train import trainer

mesh = mesh_lib.default_mesh()  # spans both processes' devices
assert mesh.devices.size == 8, mesh.devices.size

cfg = score_mlp.ScoreMLPConfig(n_joints=17, joint_dim=3, hidden_dim=64,
                               embed_dim=32, n_blocks=1,
                               embedding_type="positional")
params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
conf = ml_collections.ConfigDict()
conf.optim = ml_collections.ConfigDict(dict(
    optimizer="Adam", lr=2e-4, beta1=0.9, eps=1e-8, warmup=0,
    grad_clip=1.0, weight_decay=0))
optimizer = losses_lib.get_optimizer(conf)
state = losses_lib.init_train_state(params, optimizer, ema_decay=0.9999)
sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)
step, bsh = trainer.make_sharded_train_step(
    mesh, sde, score_mlp.apply, cfg, optimizer)

repl = NamedSharding(mesh, P())
def replicate(x):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, repl, lambda idx: x[idx])
state = jax.tree.map(replicate, state)
rng = jax.tree.map(replicate, jax.random.PRNGKey(7))
gbatch = np.linspace(0, 1, 16 * 17 * 3, dtype=np.float32).reshape(16, 17, 3)
batch = jax.make_array_from_callback(gbatch.shape, bsh, lambda idx: gbatch[idx])

new_state, loss = step(state, rng, batch, None, None)
jax.block_until_ready(loss)
loss_v = float(np.asarray(jax.device_get(loss.addressable_data(0))))
wsum = jax.jit(lambda s: jnp.sum(s.params["pre_dense"]["weight"]),
               out_shardings=repl)(new_state)
wsum_v = float(np.asarray(jax.device_get(wsum.addressable_data(0))))
print(f"RESULT loss={loss_v:.6f} wsum={wsum_v:.6f} "
      f"step={int(jax.device_get(new_state.step.addressable_data(0)))}")
jax.distributed.shutdown()
"""


CHILD_SOLVE = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from zedo_tpu.parallel import mesh as mesh_lib
mesh_lib.init_distributed(coordinator_address="localhost:" + port,
                          num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from zedo_tpu.diffusion.sampling import PCSampler
from zedo_tpu.diffusion.sde import SubVPSDE
from zedo_tpu.models import score_mlp
from zedo_tpu.ops import camera
from zedo_tpu.zeroshot import ipo as ipo_lib
from zedo_tpu.zeroshot import oil as oil_lib
from zedo_tpu.zeroshot import pipeline

mesh = mesh_lib.default_mesh()  # 4+4 devices across the two processes
assert mesh.devices.size == 8, mesh.devices.size

cfg = score_mlp.ScoreMLPConfig(n_joints=17, joint_dim=3, hidden_dim=64,
                               embed_dim=32, n_blocks=1,
                               embedding_type="positional")
params = score_mlp.init_params(jax.random.PRNGKey(2), cfg)
sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                    probability_flow=True, denoise=True, eps=0.01)
zcfg = pipeline.ZeDOConfig(ipo=ipo_lib.IPOConfig(iterations=5),
                           oil=oil_lib.OILConfig(iterations=5))

# deterministic synthetic scene, identical in both processes
rng = np.random.RandomState(7)
n = 16
pose = rng.randn(n, 17, 3).astype(np.float32) * 0.25
pose -= pose[:, 0:1]
t = np.zeros((n, 1, 3), np.float32); t[..., 2] = 4.0
k = np.zeros((n, 3, 3), np.float32)
k[:, 0, 0] = k[:, 1, 1] = 1000.0
k[:, 0, 2] = k[:, 1, 2] = 500.0
k[:, 2, 2] = 1.0
px = np.asarray(camera.project(jnp.asarray(pose + t), jnp.asarray(k)))
clusters = pose[:1]

bsh = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())
def gshard(x, sh):
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

res = pipeline.solve_sharded(
    mesh, jax.tree.map(lambda a: gshard(np.asarray(a), repl), params),
    cfg, sde, sampler, zcfg,
    gshard(clusters, repl), gshard(px, bsh), None, gshard(k, bsh),
    rng=gshard(np.asarray(jax.random.PRNGKey(0)), repl),
)
gathered = jax.jit(lambda x: x, out_shardings=repl)(res.poses)
jax.block_until_ready(gathered)
full = np.asarray(jax.device_get(gathered.addressable_data(0)))

# single-process oracle on this process's default device
local = np.asarray(pipeline.solve_jit(
    params, cfg, sde, sampler, zcfg,
    jnp.asarray(clusters), jnp.asarray(px), None, jnp.asarray(k)).poses)
maxdiff = float(np.abs(full - local).max())
print(f"RESULT shape={full.shape} sum={float(full.sum()):.6f} "
      f"maxdiff_vs_single={maxdiff:.2e} ok={maxdiff < 1e-5}")
jax.distributed.shutdown()
"""


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_two_process(child_src: str, cwd: str | None = None,
                    timeout: int = 300, devices_per_process: int = 4):
    """Launch ``child_src`` as 2 coordinated CPU processes x
    ``devices_per_process`` virtual devices and return their RESULT lines."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    inherited = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        inherited
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_repo_root(), env.get("PYTHONPATH", "")) if p)
    # children must not recurse into driver-style re-exec guards
    env.pop("_ZEDO_DRYRUN_CHILD", None)
    port = str(free_port())
    procs = [
        subprocess.Popen([sys.executable, "-c", child_src, str(pid), port],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True,
                         cwd=cwd or _repo_root())
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            assert p.returncode == 0, (out, err)
            lines = [l for l in out.splitlines() if l.startswith("RESULT")]
            assert len(lines) == 1, out
            outs.append(lines[0])
    finally:
        # if either child failed (or timed out), its sibling is still
        # blocked inside jax.distributed waiting on the dead peer — kill
        # it by HANDLE so the failure surfaces as the child's error, not
        # a multi-minute hang plus an orphaned process
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return outs


def two_process_evidence(timeout: int = 300) -> list[str]:
    """Run both 2-process checks and return human-readable summary lines
    (asserts on failure). This is what the driver-visible dryrun prints."""
    train = run_two_process(CHILD_TRAIN, timeout=timeout)
    assert train[0] == train[1], train  # replicas stayed bit-identical
    assert "step=1" in train[0], train[0]

    solve = run_two_process(CHILD_SOLVE, timeout=timeout)
    assert solve[0] == solve[1], solve  # same global result on both processes
    assert "ok=True" in solve[0], solve[0]

    return [
        "2-process train (4+4 devices, Gloo all-reduce): replicas "
        f"bit-identical [{train[0]}]",
        "2-process sharded eval solve: global result identical on both "
        f"processes and matches 1-process oracle [{solve[0]}]",
    ]
