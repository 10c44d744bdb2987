"""Config helpers: dotted-path overrides for the CLIs.

ml_collections' native `--config.x.y=v` overrides don't pass through
argparse_flags parsers (same limitation as the reference's CLIs); the
`--override x.y=v` flag routes through this helper instead.
"""
from __future__ import annotations

import ast


def apply_overrides(config, overrides: list[str]):
    """Apply 'dotted.path=value' strings to an ml_collections ConfigDict.

    Values parse as Python literals when possible ('0.5', '[1,2]', 'True'),
    else stay strings. Paths must already exist (typo protection).
    """
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like key.path=value")
        path, raw = item.split("=", 1)
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = config
        parts = path.split(".")
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"config has no key {path!r}")
        node[parts[-1]] = value
    return config
