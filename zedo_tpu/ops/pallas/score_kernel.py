"""Pallas TPU kernel: fully-fused ScoreMLP forward for the OIL hot loop.

Why: profiled on v5e at the production batch (886 poses x 50 hypotheses =
44300 rows), the XLA version of one OIL score step costs ~10ms — ~4.8ms of
matmuls plus ~5-6ms of GroupNorm traffic, because every GN materializes
[B, 1024] activations to HBM between matmuls. This kernel keeps the whole
residual MLP in VMEM per batch tile: one HBM read of x, one write of the
output, five GNs computed on VMEM-resident tiles via MXU matmuls against a
constant group-indicator matrix.

Specialization contract (checked by the caller):
  * 2 residual blocks, hidden 1024-like (lane-aligned), GroupNorm(32);
  * time-dependence folded into per-layer bias vectors
    vec_l = bias_l + W_t_l @ temb (batch-independent — precomputed per
    diffusion step OUTSIDE the kernel, models/score_mlp.py time_embedding);
  * input/output feature dim (j*d = 51) zero-padded to 128 lanes; weights
    pre-packed once per eval via `pack_weights`.

Weights live in VMEM across the whole grid (~9.4 MB bf16), batch tiles are
double-buffered by the pallas pipeline automatically.

Algebraic trick: each dense feeds a GroupNorm, and GN's mean subtraction is a
linear projector P (group averaging). GN_center(W x + v) = (I-P)W x + (I-P)v,
so the packed weights are pre-centered (W' = (I-P)W) and the per-step vectors
centered likewise — the kernel's dense outputs are already group-mean-free.
Only the variance reduction remains data-dependent: one [T,H]x[H,G] stats
matmul + one [T,G]x[G,H] broadcast matmul per GN.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


class PackedScoreWeights(NamedTuple):
    """[K, N]-layout (input-major) weight matrices, padded to lane multiples."""

    w_pre: jax.Array  # [io_pad, H]
    w_b: tuple  # 4x [H, H]: (b1_d1, b1_d2, b2_d1, b2_d2)
    w_post: jax.Array  # [H, io_pad]
    gn_bias: jax.Array  # [5, H]
    bias_post: jax.Array  # [io_pad]
    t_proj_w: jax.Array  # [5, E, H] time-projection weights (for vec precompute)
    t_proj_b: jax.Array  # [5, H] dense biases folded into the per-step vectors
    ind: jax.Array  # [H, LANE] group indicator (G columns used) / group_size
    bcast_scaled: jax.Array  # [5, LANE, H] GN scale at group-member positions


def _pad_to(x: np.ndarray, rows: int | None = None, cols: int | None = None):
    r = rows if rows is not None else x.shape[0]
    c = cols if cols is not None else (x.shape[1] if x.ndim > 1 else None)
    if x.ndim == 1:
        out = np.zeros((r,), x.dtype)
        out[: x.shape[0]] = x
        return out
    out = np.zeros((r, c), x.dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out


def pack_weights(params: dict, cfg, dtype=jnp.bfloat16,
                 gn_dtype=None) -> PackedScoreWeights:
    """Convert a ScoreMLP params pytree (torch [out, in] layout) into the
    kernel's padded input-major layout. Traceable (pure jnp on the params),
    so it can run under the jitted solve; XLA constant-folds/hoists it.

    gn_dtype controls the GroupNorm stats/broadcast matmul precision inside
    the kernel (defaults to `dtype`; pass jnp.float32 for exact-GN mode)."""
    gn_dtype = gn_dtype or dtype
    assert cfg.n_blocks == 2, "kernel specializes the shipped 2-block config"
    h = cfg.hidden_dim
    io = cfg.n_joints * cfg.joint_dim
    io_pad = math.ceil(io / LANE) * LANE
    g = cfg.group_norm_groups
    size = h // g

    def w32(p):
        return jnp.asarray(p, jnp.float32)

    # group-mean projector P [H, H]: block-diagonal 1/size within each group;
    # center = (I - P). Constants built in numpy.
    proj = np.zeros((h, h), np.float32)
    for i in range(g):
        proj[i * size : (i + 1) * size, i * size : (i + 1) * size] = 1.0 / size
    center = jnp.asarray(np.eye(h, dtype=np.float32) - proj)

    def pad2(x, rows, cols):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))

    # every dense that feeds a GN gets pre-centered columns: GN sees
    # (I-P)(Wx+v) directly (see module docstring)
    w_pre = pad2(w32(params["pre_dense"]["weight"]).T @ center, io_pad, h)
    w_b = tuple(
        w32(params[k]["weight"]).T @ center
        for k in ("b1_dense1", "b1_dense2", "b2_dense1", "b2_dense2")
    )
    w_post = pad2(w32(params["post_dense"]["weight"]).T, h, io_pad)
    bias_post = jnp.pad(w32(params["post_dense"]["bias"]), (0, io_pad - io))

    gn_names = ["pre_gnorm", "b1_gnorm1", "b1_gnorm2", "b2_gnorm1", "b2_gnorm2"]
    gn_scale = jnp.stack([w32(params[k]["weight"]) for k in gn_names])
    gn_bias = jnp.stack([w32(params[k]["bias"]) for k in gn_names])

    tp_names = ["pre_dense_t", "b1_dense1_t", "b1_dense2_t", "b2_dense1_t", "b2_dense2_t"]
    # time projections feed the same pre-GN sums -> centered too
    t_proj_w = jnp.stack([w32(params[k]["weight"]).T @ center for k in tp_names])
    dense_names = ["pre_dense", "b1_dense1", "b1_dense2", "b2_dense1", "b2_dense2"]
    t_proj_b = jnp.stack(
        [(w32(params[k]["bias"]) + w32(params[kt]["bias"])) @ center
         for k, kt in zip(dense_names, tp_names)]
    )  # dense bias + t-proj bias, both added every layer, centered

    ind = np.zeros((h, LANE), np.float32)
    for i in range(g):
        ind[i * size : (i + 1) * size, i] = 1.0 / size
    bcast = np.zeros((LANE, h), np.float32)
    for i in range(g):
        bcast[i, i * size : (i + 1) * size] = 1.0
    # per-GN broadcast matrices with the channel scale folded in
    bcast_scaled = jnp.asarray(bcast)[None, :, :] * gn_scale[:, None, :]

    as_dt = lambda a: jnp.asarray(a, dtype)
    return PackedScoreWeights(
        w_pre=as_dt(w_pre), w_b=tuple(as_dt(w) for w in w_b), w_post=as_dt(w_post),
        gn_bias=gn_bias,
        bias_post=bias_post,
        t_proj_w=as_dt(t_proj_w), t_proj_b=t_proj_b,
        ind=jnp.asarray(ind, gn_dtype),
        bcast_scaled=bcast_scaled.astype(gn_dtype),
    )


def step_vectors(packed: PackedScoreWeights, temb: jax.Array) -> jax.Array:
    """[5, H] per-step bias vectors: dense_bias + t_bias + temb @ Wt.
    temb: [E] (one diffusion step's shared time embedding)."""
    proj = jnp.einsum(
        "e,leh->lh", temb.astype(packed.t_proj_w.dtype), packed.t_proj_w,
        preferred_element_type=jnp.float32,
    )
    return proj + packed.t_proj_b  # [5, H] f32


def _gn_silu(centered_f32, ind, bcast_scaled, bias, eps=1e-5):
    """GroupNorm + SiLU on a VMEM-resident [T, H] f32 tile.

    Inputs are already group-mean-free (weights pre-centered by (I-P) in
    pack_weights), so only the variance reduction runs here: one stats
    matmul + one broadcast matmul on the MXU. The per-channel GN scale is
    folded into the broadcast matrix (bcast_scaled[g, c] = gn_scale[c] at
    group members), saving a VPU pass per GN.

    The two GN matmuls run in the dtype `ind`/`bcast_scaled` were packed in
    (pack_weights gn_dtype). At bf16 they run at full MXU rate — an f32
    matmul costs ~6-8x on the MXU, and these 10 [T,H]x[H,128] matmuls at f32
    were ~2x the cost of the four main [H,H] bf16 matmuls combined (the
    round-1 roofline gap). Accumulation stays f32; the bf16 rounding enters
    only through the squared activations and the final rstd*scale factor
    (~2^-9 relative), measured at +0.02mm on the full pipeline
    (tools/validate_dtype.py)."""
    sq = centered_f32 * centered_f32
    var_g = jnp.dot(sq.astype(ind.dtype), ind,
                    preferred_element_type=jnp.float32)
    rstd = jax.lax.rsqrt(var_g + eps)
    rstd_scale_c = jnp.dot(rstd.astype(bcast_scaled.dtype), bcast_scaled,
                           preferred_element_type=jnp.float32)
    xn = centered_f32 * rstd_scale_c + bias
    # SiLU via tanh: sigmoid(x) == 0.5 + 0.5*tanh(x/2) exactly; Mosaic's
    # tanh lowering costs ~0.07ms/step/GN less than logistic on v5e
    # (tools/bench_kernel.py --probe: full 3.29 -> tanh 2.95 ms/step)
    return xn * (0.5 * jnp.tanh(0.5 * xn) + 0.5)


def _kernel(x_ref, wpre_ref, wb1_ref, wb2_ref, wb3_ref, wb4_ref, wpost_ref,
            vecs_ref, gnbias_ref, biaspost_ref, ind_ref, bcastsc_ref,
            out_ref):
    compute_dt = wpre_ref.dtype
    x = x_ref[:].astype(compute_dt)

    def dense(h, w_ref, vec_row):
        acc = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        return acc + vecs_ref[vec_row, :][None, :]

    ind = ind_ref[:]

    h = dense(x, wpre_ref, 0)
    h = _gn_silu(h, ind, bcastsc_ref[0], gnbias_ref[0, :][None])

    h1 = dense(h.astype(compute_dt), wb1_ref, 1)
    h1 = _gn_silu(h1, ind, bcastsc_ref[1], gnbias_ref[1, :][None])
    h2 = dense(h1.astype(compute_dt), wb2_ref, 2)
    h2 = _gn_silu(h2, ind, bcastsc_ref[2], gnbias_ref[2, :][None])
    h = h + h2

    h1 = dense(h.astype(compute_dt), wb3_ref, 3)
    h1 = _gn_silu(h1, ind, bcastsc_ref[3], gnbias_ref[3, :][None])
    h2 = dense(h1.astype(compute_dt), wb4_ref, 4)
    h2 = _gn_silu(h2, ind, bcastsc_ref[4], gnbias_ref[4, :][None])
    h = h + h2

    out = jnp.dot(h.astype(compute_dt), wpost_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + biaspost_ref[:][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_score_forward(
    x_pad: jax.Array,  # [B_pad, io_pad] zero-padded flat poses
    packed: PackedScoreWeights,
    vecs: jax.Array,  # [5, H] f32 step vectors (step_vectors())
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One fused forward pass: [B_pad, io_pad] -> [B_pad, io_pad] f32.

    B_pad must be a multiple of `tile` (pad once outside the diffusion scan).
    """
    b_pad, io_pad = x_pad.shape
    assert b_pad % tile == 0, (b_pad, tile)
    h = packed.w_pre.shape[1]  # shapes stay static under jit; int fields don't
    grid = (b_pad // tile,)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, io_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((io_pad, h)),
            full((h, h)), full((h, h)), full((h, h)), full((h, h)),
            full((h, io_pad)),
            full((5, h)), full((5, h)),
            full((io_pad,)),
            full((h, LANE)), full((5, LANE, h)),
        ],
        out_specs=pl.BlockSpec((tile, io_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, io_pad), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * (2 * io_pad * h + 4 * h * h + 10 * h * LANE),
            bytes_accessed=b_pad * io_pad * 8 + (4 * h * h + 2 * io_pad * h) * 2,
            transcendentals=5 * b_pad * h,
        ),
    )(
        x_pad, packed.w_pre, *packed.w_b, packed.w_post,
        vecs, packed.gn_bias, packed.bias_post,
        packed.ind, packed.bcast_scaled,
    )


def analytic_fwd_flops(batch_rows: int, cfg) -> int:
    """Analytic FLOPs of one fused score forward on `batch_rows` poses —
    the same formula as the kernel's `cost_estimate` above (generalized over
    n_blocks: the 4*h*h term is the 2*n_blocks hidden matmuls, the 10*h*LANE
    term the (1+2*n_blocks) GroupNorms' two indicator matmuls each). Used by
    bench.py to put achieved model-FLOP/s and MFU into the artifact."""
    h = cfg.hidden_dim
    io = cfg.n_joints * cfg.joint_dim
    io_pad = math.ceil(io / LANE) * LANE
    n_gn = 1 + 2 * cfg.n_blocks
    return 2 * batch_rows * (
        2 * io_pad * h + 2 * cfg.n_blocks * h * h + 2 * n_gn * h * LANE
    )


def pad_rows(x: jax.Array, tile: int) -> jax.Array:
    """Zero-pad leading axis to a tile multiple."""
    b = x.shape[0]
    target = math.ceil(b / tile) * tile
    if target == b:
        return x
    return jnp.pad(x, ((0, target - b),) + ((0, 0),) * (x.ndim - 1))
