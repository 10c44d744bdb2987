"""Wrapper config for the committed small trained checkpoint.

The stock optim configs describe the full-size (1024/512) published models;
the in-repo demo checkpoint (tests/fixtures/trained) is a small 256/128
prior. `config.model.{hidden_dim,embed_dim,n_blocks}` overrides are read by
`models.registry.make_mlp_config`, so wrapping the stock config like this is
all it takes to run a differently-sized checkpoint through the unmodified
CLIs and the serving API — the same pattern works for any custom model size.
"""
import numpy as np

import configs.optim.concat_pose_optimization_h36m as base


def get_config():
    import os

    config = base.get_config()
    family = np.load(os.path.join(
        os.path.dirname(__file__), os.pardir, "tests", "fixtures", "trained",
        "family.npz"))
    with config.unlocked():
        config.model.hidden_dim = int(family["hidden"])
        config.model.embed_dim = int(family["embed"])
        config.model.n_blocks = int(family["n_blocks"])
    return config
