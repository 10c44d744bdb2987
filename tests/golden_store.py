"""Golden fixtures for the reference-parity suite (VERDICT r4 next #2).

The parity tests in test_reference_parity.py assert the jax stack against the
reference implementation's OWN torch code. That evidence was not hermetic:
without /root/reference + torch (`ZEDO_REF_PARITY=0`) every numeric parity
bar silently vanished. This module freezes the reference side of each test
into committed `.npz` goldens so the SAME assertions run in three modes:

  live    — /root/reference + torch importable and ZEDO_REF_PARITY!=0:
            the reference code executes per test (strongest evidence).
  regen   — live + ZEDO_REGEN_GOLDEN=1: additionally rewrites the committed
            goldens under tests/fixtures/goldens/ (run after changing any
            parity test's inputs:  ZEDO_REGEN_GOLDEN=1 python -m pytest
            tests/test_reference_parity.py -q).
  golden  — reference or torch unavailable (or ZEDO_REF_PARITY=0): the
            reference side loads from the committed goldens; the numeric
            bars still hold. A test whose golden file is missing skips
            loudly rather than passing vacuously.

Inputs stay deterministic across modes because every test draws them from
the seeded `rng` fixture (np.random.RandomState(0), conftest.py) — the
goldens therefore only need to store the *reference-computed* values
(including torch-initialized state dicts, which cannot be reproduced
without torch).

Value encoding (recursive): ndarray/scalar -> one npz entry; list/tuple ->
`key#len` + `key#i` entries; dict (str keys, no '/' in keys) -> `key/sub`
entries. Covers state dicts (dot-keyed flat dicts), shadow-param lists, and
plain arrays.
"""
from __future__ import annotations

import os
import re

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "goldens")
REF_ROOT = "/root/reference"


def live_available() -> bool:
    if os.environ.get("ZEDO_REF_PARITY", "1").lower() in ("0", "off", "false"):
        return False
    if not os.path.isdir(REF_ROOT):
        return False
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return True


REGEN = os.environ.get("ZEDO_REGEN_GOLDEN", "0").lower() in ("1", "on", "true")


def _flatten(key: str, value, out: dict) -> None:
    if isinstance(value, dict):
        for k, v in value.items():
            assert "/" not in str(k), f"dict key {k!r} contains '/'"
            _flatten(f"{key}/{k}", v, out)
    elif isinstance(value, (list, tuple)):
        out[f"{key}#len"] = np.asarray(len(value))
        for i, v in enumerate(value):
            _flatten(f"{key}#{i}", v, out)
    else:
        arr = np.asarray(value)
        assert arr.dtype != object, f"{key}: object arrays not supported"
        out[key] = arr


def _unflatten(files: dict, key: str):
    if key in files:
        return files[key]
    if f"{key}#len" in files:
        return [_unflatten(files, f"{key}#{i}")
                for i in range(int(files[f"{key}#len"]))]
    prefix = key + "/"
    subs = {f[len(prefix):].split("/")[0].split("#")[0]
            for f in files if f.startswith(prefix)}
    if subs:
        return {s: _unflatten(files, prefix + s) for s in sorted(subs)}
    raise KeyError(
        f"golden key {key!r} not in fixture — regenerate with "
        f"ZEDO_REGEN_GOLDEN=1 (tests/golden_store.py)")


def case_name(nodeid: str) -> str:
    """'tests/test_x.py::test_y[a-b]' -> 'test_y__a-b' (filesystem-safe)."""
    name = nodeid.split("::")[-1]
    return re.sub(r"[^A-Za-z0-9_.-]+", "__", name).strip("_")


class GoldenCase:
    def __init__(self, name: str):
        self.name = name
        self.path = os.path.join(GOLDEN_DIR, name + ".npz")
        self.live = live_available()
        self._store: dict = {}
        self._models: dict = {}
        self._files = None
        if not self.live:
            if not os.path.exists(self.path):
                pytest.skip(
                    f"reference unavailable and no golden fixture "
                    f"{self.name}.npz — regenerate with ZEDO_REGEN_GOLDEN=1")
            with np.load(self.path, allow_pickle=False) as z:
                self._files = {k: z[k] for k in z.files}

    def get(self, key: str, fn):
        """The reference-side value: `fn()` live (and captured under REGEN),
        the committed golden otherwise. `fn` may return ndarrays, scalars,
        lists/tuples, or (nested) dicts thereof."""
        if self.live:
            value = fn()
            if REGEN:  # _store is only ever written under REGEN
                _flatten(key, value, self._store)
            return value
        return _unflatten(self._files, key)

    def keep_model(self, key: str, model) -> None:
        """Stash a live torch model for later ref-side closures."""
        self._models[key] = model

    def model(self, key: str):
        assert self.live, "torch models only exist in live mode"
        return self._models[key]

    def finalize(self) -> None:
        if self.live and REGEN:
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            np.savez_compressed(self.path, **self._store)
