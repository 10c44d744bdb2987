"""A compact PyTorch mirror of the reference score network, used ONLY as a
golden-test oracle for layer semantics (GroupNorm eps/ordering, SiLU, time
embeddings, residual wiring) and for checkpoint-conversion tests.

Written from the architecture description in SURVEY.md §2.2 / the reference's
documented behavior (model.py:97-298) — an independent implementation, not a
copy: conditioning dead paths, masking machinery, and torchvision baggage are
omitted; only the live forward computation is mirrored.
"""
import math

import numpy as np
import torch
import torch.nn as nn


def timestep_embedding(t: torch.Tensor, dim: int, max_positions: int = 10000):
    half = dim // 2
    freqs = torch.exp(
        torch.arange(half, dtype=torch.float32) * (-math.log(max_positions) / (half - 1))
    )
    args = t.float()[:, None] * freqs[None, :]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=1)
    if dim % 2 == 1:
        emb = torch.nn.functional.pad(emb, (0, 1))
    return emb


class TorchScoreMLP(nn.Module):
    def __init__(self, n_joints=17, joint_dim=3, hidden=1024, embed=512,
                 n_blocks=2, embedding_type="positional", fourier_scale=16.0,
                 sigma_min=0.01, sigma_max=50.0, num_scales=1000,
                 scale_by_sigma=False, dropout=0.25):
        super().__init__()
        io = n_joints * joint_dim
        self.n_joints = n_joints
        self.n_blocks = n_blocks
        self.embedding_type = embedding_type
        self.embed = embed
        self.scale_by_sigma = scale_by_sigma
        self.act = nn.SiLU()
        self.dropout = nn.Dropout(p=dropout)

        self.pre_dense = nn.Linear(io, hidden)
        self.pre_dense_t = nn.Linear(embed, hidden)
        self.pre_gnorm = nn.GroupNorm(32, num_channels=hidden)
        if embedding_type == "fourier":
            self.gauss_proj = nn.Module()
            self.gauss_proj.W = nn.Parameter(
                torch.randn(embed // 2) * fourier_scale, requires_grad=False
            )
        self.shared_time_embed = nn.Sequential(nn.Linear(embed, embed), nn.SiLU())
        sigmas = np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales))
        self.register_buffer("sigmas", torch.tensor(sigmas))
        for idx in range(n_blocks):
            setattr(self, f"b{idx+1}_dense1", nn.Linear(hidden, hidden))
            setattr(self, f"b{idx+1}_dense1_t", nn.Linear(embed, hidden))
            setattr(self, f"b{idx+1}_gnorm1", nn.GroupNorm(32, num_channels=hidden))
            setattr(self, f"b{idx+1}_dense2", nn.Linear(hidden, hidden))
            setattr(self, f"b{idx+1}_dense2_t", nn.Linear(embed, hidden))
            setattr(self, f"b{idx+1}_gnorm2", nn.GroupNorm(32, num_channels=hidden))
        self.post_dense = nn.Linear(hidden, io)

    def forward(self, batch, t, condition=None, mask=None):
        bs = batch.shape[0]
        x = batch.reshape(bs, -1)
        if self.embedding_type == "fourier":
            used_sigmas = t
            proj = torch.log(t)[:, None] * self.gauss_proj.W[None, :] * 2 * math.pi
            temb = torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)
        else:
            used_sigmas = self.sigmas[t.long()]
            temb = timestep_embedding(t, self.embed)
        temb = self.shared_time_embed(temb)

        h = self.pre_dense(x) + self.pre_dense_t(temb)
        h = self.act(self.pre_gnorm(h))
        h = self.dropout(h)
        for idx in range(self.n_blocks):
            h1 = getattr(self, f"b{idx+1}_dense1")(h) + getattr(self, f"b{idx+1}_dense1_t")(temb)
            h1 = self.dropout(self.act(getattr(self, f"b{idx+1}_gnorm1")(h1)))
            h2 = getattr(self, f"b{idx+1}_dense2")(h1) + getattr(self, f"b{idx+1}_dense2_t")(temb)
            h2 = self.dropout(self.act(getattr(self, f"b{idx+1}_gnorm2")(h2)))
            h = h + h2
        res = self.post_dense(h).view(bs, self.n_joints, -1)
        if self.scale_by_sigma:
            res = res / used_sigmas.reshape(bs, 1, 1)
        return res
