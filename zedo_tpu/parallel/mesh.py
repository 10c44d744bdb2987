"""Device-mesh helpers: the scaling story of the framework.

The workload's parallel axes (SURVEY §2.6): N poses (shard over devices), S
hypotheses (vmap), 1000 OIL steps (scan, inherently sequential). There is no
tensor/pipeline parallelism need at 3.3M params — weights are replicated —
but `tp_shardings` provides hidden-dim sharding rules for the score MLP so
the same model scales if widened.

Multi-host: call `init_distributed()` (jax.distributed.initialize) before
building a mesh; `jax.devices()` then spans all hosts, GSPMD handles DCN.
Launch recipe (one command per host):
    init_distributed(coordinator_address="<host0>:<port>",
                     num_processes=H, process_id=h)
then `default_mesh()` spans all H hosts' chips; shard global arrays with
`jax.make_array_from_callback`/`jax.make_array_from_process_local_data`.
Exercised end-to-end by tests/test_distributed.py: a real 2-process run of
the sharded train step (cross-process gradient all-reduce, replicas
bit-identical) and the single-process bring-up path.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs):
    """Multi-host bring-up (replaces torch dist.init_process_group, which the
    reference imports but never calls — SURVEY §2.6)."""
    jax.distributed.initialize(**kwargs)


def default_mesh(
    devices=None, data_axis: str = "data", model_axis: Optional[str] = None,
    model_parallel: int = 1,
) -> Mesh:
    """1D data mesh by default; optionally 2D (data x model)."""
    devices = list(devices if devices is not None else jax.devices())
    if model_axis is None or model_parallel <= 1:
        return Mesh(np.array(devices), (data_axis,))
    n = len(devices)
    assert n % model_parallel == 0
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def mesh_from_spec(spec: Optional[str], devices=None) -> Optional[Mesh]:
    """CLI-facing mesh builder (the reference engages multi-GPU training from
    config alone, train_pose_mini.py:269 `nn.DataParallel(..., config.GPUs)`;
    the TPU equivalent is a mesh built from a flag).

    Spec grammar:
      'auto'        -> 1-D data mesh over all devices when >1, else None
      'off'/'none'  -> None (single-device)
      'dp[N]'       -> data mesh over N (default: all) devices
      'dp[N],tpM'   -> 2-D (data x model) mesh, N*M devices
    """
    spec = (spec or "auto").strip().lower()
    if spec in ("off", "none", "single", "1"):
        return None
    devices = list(devices if devices is not None else jax.devices())
    if spec == "auto":
        if len(devices) <= 1:
            return None
        return Mesh(np.array(devices), ("data",))
    m = re.fullmatch(r"dp([1-9]\d*)?(?:,tp([1-9]\d*))?", spec)
    if not m:
        raise ValueError(
            f"bad --mesh spec {spec!r}: expected auto|off|dp[N][,tpM] "
            f"with N, M >= 1")
    tp = int(m.group(2) or 1)
    dp = int(m.group(1)) if m.group(1) else max(1, len(devices) // tp)
    need = dp * tp
    if need > len(devices):
        raise ValueError(
            f"--mesh {spec!r} needs {need} devices, have {len(devices)}")
    devices = devices[:need]
    if tp > 1:
        return Mesh(np.array(devices).reshape(dp, tp), ("data", "model"))
    return Mesh(np.array(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def tp_shardings(mesh: Mesh, params: dict, model_axis: str = "model") -> dict:
    """Tensor-parallel PartitionSpecs for ScoreMLP params: shard the hidden
    dim of every [hidden, *] weight/bias over `model_axis`; GroupNorm shards
    cleanly because 1024/|model| stays group-aligned (groups of 32 channels).
    Output-projection (post_dense) keeps hidden on the contracting side —
    XLA inserts the reduce(-scatter) automatically."""
    hidden = params["pre_dense"]["weight"].shape[0]

    def spec(path, leaf):
        shape = leaf.shape
        if len(shape) == 2:
            if shape[0] == hidden:  # [hidden, in] -> row-shard
                return P(model_axis, None)
            if shape[1] == hidden:  # [out, hidden] -> column-shard
                return P(None, model_axis)
        if len(shape) == 1 and shape[0] == hidden:
            return P(model_axis)
        return P()

    flat, treedef = jax.tree.flatten_with_path(params)
    specs = [spec(path, leaf) for path, leaf in flat]
    return jax.tree.unflatten(treedef, [NamedSharding(mesh, s) for s in specs])
