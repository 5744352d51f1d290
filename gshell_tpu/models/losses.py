"""DDPM training loss + step function for G-MeshDiffusion.

Twin of ``GMeshDiffusion/lib/diffusion/losses.py:25-250``: ε-prediction DDPM
loss with feature-mask + occ-mask weighted MSE (ref :100-120), AdamW with
linear warmup and global-norm clipping (ref optimization_manager :40-58).
bf16 autocast ↔ bf16 activations inside the model; the GradScaler has no
TPU counterpart (bf16 needs no loss scaling) and is intentionally absent.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .sde import VPSDE, perturb


def sample_perturbation(sde: VPSDE, key: jax.Array, x, x_occ):
    """The loss's stochastic draws, shared verbatim between the monolithic
    loss and the segmented-backward trainer (so both see identical labels /
    noise / dropout keys for a given step key).
    Returns (labels, noise, perturbed, noise_occ, perturbed_occ, k_drop)."""
    b = x.shape[0]
    k_t, k_n, k_no, k_drop = jax.random.split(key, 4)
    labels = jax.random.randint(k_t, (b,), 0, sde.N)
    noise = jax.random.normal(k_n, x.shape)
    perturbed = perturb(sde, x, labels, noise)
    if x_occ is not None:
        noise_occ = jax.random.normal(k_no, x_occ.shape)
        perturbed_occ = perturb(sde, x_occ, labels, noise_occ)
    else:
        noise_occ = perturbed_occ = None
    return labels, noise, perturbed, noise_occ, perturbed_occ, k_drop


def masked_score_mse(
    score, score_occ, noise, noise_occ, feature_mask, occ_mask, b
):
    """Feature-mask + occ-mask weighted MSE (ref losses.py:100-120)."""
    losses = (score.astype(jnp.float32) - noise) ** 2
    fm = feature_mask if feature_mask is not None else jnp.ones_like(losses[:1])
    losses = losses * fm
    denom = fm.sum()
    total = losses.sum()
    if score_occ is not None:
        score_occ = score_occ.astype(jnp.float32)
        om = occ_mask if occ_mask is not None else jnp.ones_like(score_occ[:1])
        total = total + (((score_occ - noise_occ) ** 2) * om).sum()
        denom = denom + om.sum()
    return total / denom / b


def make_ddpm_loss_fn(
    sde: VPSDE,
    apply_fn: Callable,
    feature_mask: Optional[jax.Array] = None,
    occ_mask: Optional[jax.Array] = None,
    pred_type: str = "noise",
):
    """Returns loss_fn(params, key, batch) for batches
    {'grid': (B,D,D,D,C), 'occgrid': (B,2D,2D,2D,1)} (channels-last)."""

    def loss_fn(params, key, batch, train: bool = True):
        x = batch["grid"]
        x_occ = batch.get("occgrid")
        b = x.shape[0]
        labels, noise, perturbed, noise_occ, perturbed_occ, k_drop = (
            sample_perturbation(sde, key, x, x_occ)
        )

        pred, pred_occ = apply_fn(
            params,
            perturbed,
            perturbed_occ,
            labels,
            train=train,
            rngs={"dropout": k_drop} if train else None,
        )
        pred = pred.astype(jnp.float32)

        if pred_type == "noise":
            score, score_occ = pred, pred_occ
        else:  # x0 prediction → convert (ref losses.py:95-99)
            a1 = sde.sqrt_alphas_cumprod[labels].reshape(-1, 1, 1, 1, 1)
            a2 = sde.sqrt_1m_alphas_cumprod[labels].reshape(-1, 1, 1, 1, 1)
            score = (perturbed - pred * a1) / a2
            score_occ = (
                (perturbed_occ - pred_occ * a1) / a2 if pred_occ is not None else None
            )

        return masked_score_mse(
            score, score_occ, noise, noise_occ, feature_mask, occ_mask, b
        )

    return loss_fn


def make_optimizer(
    lr: float = 1e-5,
    warmup: int = 5000,
    grad_clip: float = 1.0,
    weight_decay: float = 1e-5,
    beta1: float = 0.9,
    eps: float = 1e-8,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW + linear warmup + grad clipping (ref config optim.*).

    ``mu_dtype``: dtype of the first moment — ``bfloat16`` halves its HBM
    residency (0.8 GB at the 411M-param reference UNet), which is part of
    what lets the segmented 128³ step fit one 16 GB chip.  Default f32
    matches the reference exactly."""
    schedule = lambda step: lr * jnp.minimum(step / max(warmup, 1), 1.0)
    txs = []
    if grad_clip and grad_clip > 0:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(
        optax.adamw(schedule, b1=beta1, b2=0.999, eps=eps,
                    weight_decay=weight_decay, mu_dtype=mu_dtype)
    )
    return optax.chain(*txs)
