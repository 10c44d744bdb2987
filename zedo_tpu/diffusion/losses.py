"""Score-matching losses and the jitted train/eval step.

Rebuild of lib/algorithms/advanced/losses.py on optax. The reference's
optimize_fn applies linear LR warmup then global-norm grad clipping then Adam
(losses.py:39-53); here that is one optax chain so the entire train step —
loss, backward, clip, Adam, EMA — is a single compiled program, pmappable /
pjittable over the batch.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from zedo_tpu.diffusion import ema as ema_lib
from zedo_tpu.diffusion.score import get_score_fn
from zedo_tpu.diffusion.sde import SDE, VESDE, VPSDE, _bcast


def lr_schedule(config):
    """The LR-vs-step schedule (linear warmup then flat — the reference's
    optimization_manager, losses.py:39-53), exposed so the trainer can log
    the reference's per-epoch `opt_LR_{i}` TensorBoard scalar
    (train_pose_mini.py:362) without duplicating the formula."""
    warmup = config.optim.warmup
    lr = config.optim.lr

    def schedule(step):
        if warmup > 0:
            return lr * jnp.minimum(step / warmup, 1.0)
        return lr

    return schedule


def get_optimizer(config) -> optax.GradientTransformation:
    """Adam with warmup + clipping, matching losses.py:26-53 semantics.

    Reference order: warmup scales LR; clip_grad_norm_ caps the global norm;
    Adam steps. optax.chain(clip, adam(schedule)) reproduces it.
    """
    if config.optim.optimizer != "Adam":
        raise NotImplementedError(f"Optimizer {config.optim.optimizer} not supported yet!")
    schedule = lr_schedule(config)

    transforms = []
    if config.optim.grad_clip >= 0:
        transforms.append(optax.clip_by_global_norm(config.optim.grad_clip))
    wd = float(config.optim.get("weight_decay", 0) or 0)
    if wd:
        # torch.optim.Adam(weight_decay=wd) adds wd*param to the RAW gradient
        # before the moment updates (coupled L2, not AdamW) — add_decayed_
        # weights placed before adam reproduces that
        transforms.append(optax.add_decayed_weights(wd))
    transforms.append(
        optax.adam(schedule, b1=config.optim.beta1, b2=0.999, eps=config.optim.eps)
    )
    return optax.chain(*transforms)


def get_sde_loss_fn(
    sde: SDE,
    model_apply: Callable,
    train: bool,
    reduce_mean: bool = False,
    continuous: bool = True,
    likelihood_weighting: bool = False,
    eps: float = 1e-5,
):
    """Continuous denoising score matching (losses.py:56-104).

    model_apply(params, x, labels, condition, mask, train, rng) -> output.
    Returns loss_fn(params, rng, batch, condition, mask) -> scalar.
    """
    reduce_op = (
        (lambda x: jnp.mean(x, axis=-1))
        if reduce_mean
        else (lambda x: 0.5 * jnp.sum(x, axis=-1))
    )

    def loss_fn(params, rng, batch, condition=None, mask=None):
        t_rng, z_rng, drop_rng = jax.random.split(rng, 3)

        def model_fn(x, labels, cond, msk):
            return model_apply(params, x, labels, cond, msk, train=train, rng=drop_rng)

        score_fn = get_score_fn(sde, model_fn, continuous=continuous)
        t = jax.random.uniform(t_rng, (batch.shape[0],)) * (sde.T - eps) + eps
        z = jax.random.normal(z_rng, batch.shape, batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        perturbed = mean + _bcast(std, batch) * z
        score = score_fn(perturbed, t, condition, mask)

        if not likelihood_weighting:
            losses = jnp.square(score * _bcast(std, batch) + z)
            losses = reduce_op(losses.reshape(losses.shape[0], -1))
        else:
            g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
            losses = jnp.square(score + z / _bcast(std, batch))
            losses = reduce_op(losses.reshape(losses.shape[0], -1)) * g2
        return jnp.mean(losses)

    return loss_fn


def get_smld_loss_fn(vesde: VESDE, model_apply, train: bool, reduce_mean: bool = False):
    """Legacy SMLD/NCSN discrete loss (losses.py:107-128)."""
    assert isinstance(vesde, VESDE), "SMLD training only works for VESDEs."
    smld_sigma_array = jnp.flip(vesde.discrete_sigmas)
    reduce_op = (
        (lambda x: jnp.mean(x, axis=-1))
        if reduce_mean
        else (lambda x: 0.5 * jnp.sum(x, axis=-1))
    )

    def loss_fn(params, rng, batch, condition=None, mask=None):
        l_rng, z_rng, drop_rng = jax.random.split(rng, 3)
        labels = jax.random.randint(l_rng, (batch.shape[0],), 0, vesde.n)
        sigmas = smld_sigma_array[labels]
        noise = jax.random.normal(z_rng, batch.shape, batch.dtype) * _bcast(sigmas, batch)
        perturbed = noise + batch
        score = model_apply(params, perturbed, labels, condition, mask, train=train, rng=drop_rng)
        target = -noise / _bcast(sigmas**2, batch)
        losses = jnp.square(score - target)
        losses = reduce_op(losses.reshape(losses.shape[0], -1)) * sigmas**2
        return jnp.mean(losses)

    return loss_fn


def get_ddpm_loss_fn(vpsde: VPSDE, model_apply, train: bool, reduce_mean: bool = True):
    """Legacy DDPM discrete loss (losses.py:131-151)."""
    assert isinstance(vpsde, VPSDE), "DDPM training only works for VPSDEs."
    reduce_op = (
        (lambda x: jnp.mean(x, axis=-1))
        if reduce_mean
        else (lambda x: 0.5 * jnp.sum(x, axis=-1))
    )

    def loss_fn(params, rng, batch, condition=None, mask=None):
        l_rng, z_rng, drop_rng = jax.random.split(rng, 3)
        labels = jax.random.randint(l_rng, (batch.shape[0],), 0, vpsde.n)
        noise = jax.random.normal(z_rng, batch.shape, batch.dtype)
        perturbed = (
            _bcast(vpsde.sqrt_alphas_cumprod[labels], batch) * batch
            + _bcast(vpsde.sqrt_1m_alphas_cumprod[labels], batch) * noise
        )
        score = model_apply(params, perturbed, labels, condition, mask, train=train, rng=drop_rng)
        losses = jnp.square(score - noise)
        losses = reduce_op(losses.reshape(losses.shape[0], -1))
        return jnp.mean(losses)

    return loss_fn


def mixed_precision_apply(model_apply, compute_dtype=jnp.bfloat16):
    """Mixed-precision wrapper for a model_apply(p, x, labels, cond, msk,
    train, rng) fn: casts f32 params and inputs to `compute_dtype` for the
    forward (bf16 matmuls run at full MXU rate — ~8x fp32 on v5e), returns
    f32 outputs, so the loss, gradients, Adam moments, and master weights
    all stay f32 (standard mixed-precision training; the cast is
    differentiable, so grads accumulate back onto the f32 params)."""

    def apply(p, x, labels, cond, msk, train=False, rng=None):
        p_c = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32 else a, p)
        out = model_apply(p_c, x.astype(compute_dtype), labels, cond, msk,
                          train=train, rng=rng)
        return out.astype(jnp.float32)

    return apply


class TrainState(NamedTuple):
    """Replaces the reference's mutable `state` dict (losses.py:180-211)."""

    step: jax.Array
    params: dict
    opt_state: optax.OptState
    ema: ema_lib.EMAState


def init_train_state(params, optimizer, ema_decay: float) -> TrainState:
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema=ema_lib.init(params, decay=ema_decay),
    )


def get_step_fn(
    sde: SDE,
    model_apply,
    optimizer: Optional[optax.GradientTransformation],
    train: bool,
    reduce_mean: bool = False,
    continuous: bool = True,
    likelihood_weighting: bool = False,
    grad_mask=None,
):
    """One train/eval step (losses.py:154-213) as a pure function.

    Train: grads -> clip -> Adam(warmed lr) -> EMA update.
    Eval: loss under EMA params (the reference's store/copy_to/restore dance
    collapses to `ema.shadow_params`).

    grad_mask: optional bool pytree matching params — False leaves are
    frozen (the reference's requires_grad=False / ControlNet freeze(),
    control_model.py:224-232). Gradients are zeroed BEFORE the optimizer
    chain, so global-norm clipping sees only trainable gradients (as
    torch's clip_grad_norm_ over trainable params does), and the final
    updates are masked again so no transform (e.g. coupled weight decay)
    can move a frozen leaf.
    """
    if continuous:
        loss_fn = get_sde_loss_fn(
            sde, model_apply, train, reduce_mean=reduce_mean,
            continuous=True, likelihood_weighting=likelihood_weighting,
        )
    else:
        assert not likelihood_weighting, (
            "Likelihood weighting is not supported for original SMLD/DDPM training."
        )
        if isinstance(sde, VESDE):
            loss_fn = get_smld_loss_fn(sde, model_apply, train, reduce_mean=reduce_mean)
        elif isinstance(sde, VPSDE):
            loss_fn = get_ddpm_loss_fn(sde, model_apply, train, reduce_mean=reduce_mean)
        else:
            raise ValueError(
                f"Discrete training for {type(sde).__name__} is not recommended."
            )

    if train:

        def _buffer_paths(path):
            # non-trainable buffers, frozen regardless of grad_mask: the
            # reference registers `sigmas` as a buffer (model.py:132) and
            # pins the fourier projection W with requires_grad=False
            # (model.py:33) — without this, fourier training would drift
            # the fixed time-feature basis via its real gradient, and
            # coupled weight decay would shrink `sigmas` despite its zero
            # gradient
            keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
            return ("sigmas" in keys) or ("gauss_proj" in keys and "W" in keys)

        def _mask(tree):
            def leaf(path, g, m=True):
                frozen = _buffer_paths(path) or not m
                return jnp.zeros_like(g) if frozen else g

            if grad_mask is None:
                return jax.tree_util.tree_map_with_path(leaf, tree)
            return jax.tree_util.tree_map_with_path(leaf, tree, grad_mask)

        def step_fn(state: TrainState, rng, batch, condition=None, mask=None):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, rng, batch, condition, mask
            )
            grads = _mask(grads)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            updates = _mask(updates)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema=ema_lib.update(state.ema, params),
            )
            return new_state, loss

    else:

        def step_fn(state: TrainState, rng, batch, condition=None, mask=None):
            loss = loss_fn(ema_lib.params_of(state.ema), rng, batch, condition, mask)
            return state, loss

    return step_fn
