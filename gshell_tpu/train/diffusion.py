"""G-MeshDiffusion trainer: data-parallel, grad-accumulating, preemption-safe.

TPU-native twin of ``GMeshDiffusion/lib/diffusion/trainer.py:20-163`` and
``trainer_ddp.py:22-187``:

  reference (8×GPU NCCL DDP)            this (TPU mesh)
  ────────────────────────────          ─────────────────────────────────────
  torchrun 8 procs + DDP wrapper        one jitted step over Mesh('data')
  no_sync() grad accumulation           lax.scan over microbatches
  NCCL all-reduce on last microbatch    XLA psum inserted by sharding
  GradScaler (fp16)                     — (bf16 needs no loss scaling)
  checkpoints-meta preemption resume    orbax checkpointing (save/restore)
  EMA shadow params                     ema.py pytree map
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.ema import EMAState, ema_init, ema_update
from ..models.losses import make_ddpm_loss_fn, make_optimizer
from ..models.sde import make_vpsde
from ..models.unet3d import UNet3D, UNet3DConfig
from ..parallel.sharding import data_sharding, make_mesh, replicated


@dataclasses.dataclass(frozen=True)
class DiffusionTrainConfig:
    grid_size: int = 128
    data_ch: int = 4
    use_occ: bool = True
    batch_per_step: int = 8  # global batch (ref: 8 ranks × 1)
    num_grad_acc_steps: int = 4
    lr: float = 1e-5
    warmup: int = 5000
    grad_clip: float = 1.0
    weight_decay: float = 1e-5
    ema_rate: float = 0.9999
    beta_min: float = 0.1
    beta_max: float = 20.0
    num_scales: int = 1000
    snapshot_freq: int = 1000
    param_dtype: str = "float32"
    # Segmented backward: compile the step as FOUR half-sized programs
    # (down fwd / up fwd+bwd / down fwd+bwd / optimizer) instead of one.
    # Needed at the reference 128³ working point: the axon remote-compile
    # helper crashes (HTTP 500) on the monolithic 128³ fwd+bwd regardless
    # of remat/occ-head, while 96³ compiles — see models/unet3d.UNet3D
    # ``segment``.  Costs one extra down-path forward per step.
    segmented_grad: bool = False
    # How many (low-res) up LEVELS run inside the first segment — balances
    # the two programs' compile load (unet3d.UNet3D ``up_split``).  At 128³
    # the up path alone still crashes the helper with split 0; 4 moves all
    # sub-32³ up levels into the first program.
    segmented_up_split: int = 0
    # block-granular boundary: how many LEADING blocks of level
    # segmented_up_split also run in the first segment (the 128³ level's
    # three blocks are where up_grad's peak lives)
    segmented_up_split_blocks: int = 0
    # HBM residency of the non-param state during the grad programs (the
    # per-program compile check cannot see it): bf16 Adam-mu + bf16 EMA
    # free ~1.6 GB at the reference 411M-param UNet.  f32 = reference-exact.
    mu_dtype: Optional[str] = None
    ema_dtype: Optional[str] = None


def _is_groupnorm_mod(key: str, val) -> bool:
    return (
        key.startswith("GroupNormF32")
        and isinstance(val, dict)
        and set(val) == {"scale", "bias"}
    )


def _wrap_groupnorm_template(tree):
    """New-format state -> old-format template: every GroupNormF32 module's
    flat ``{scale,bias}`` moves under a nested ``GroupNorm_0`` submodule (the
    layout the pre-rewrite wrapper around nn.GroupNorm produced)."""

    def rec(node):
        if isinstance(node, dict):
            return {
                k: ({"GroupNorm_0": v} if _is_groupnorm_mod(k, v) else rec(v))
                for k, v in node.items()
            }
        if hasattr(node, "_fields"):  # NamedTuple (DiffusionTrainState etc.)
            return type(node)(*(rec(v) for v in node))
        return node

    return rec(tree)


def _unwrap_groupnorm(tree):
    """Old-format restored state -> new format: inverse of the wrap."""

    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k.startswith("GroupNormF32")
                    and isinstance(v, dict)
                    and set(v) == {"GroupNorm_0"}
                ):
                    v = v["GroupNorm_0"]
                out[k] = rec(v)
            return out
        if hasattr(node, "_fields"):
            return type(node)(*(rec(v) for v in node))
        return node

    return rec(tree)


class DiffusionTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    ema: EMAState
    step: jax.Array


class DiffusionTrainer:
    def __init__(
        self,
        cfg: DiffusionTrainConfig,
        unet_cfg: Optional[UNet3DConfig] = None,
        feature_mask=None,
        occ_mask=None,
        mesh=None,
    ):
        self.cfg = cfg
        self.unet_cfg = unet_cfg or UNet3DConfig(
            data_ch=cfg.data_ch, use_occ=cfg.use_occ
        )
        self.model = UNet3D(self.unet_cfg)
        self.sde = make_vpsde(cfg.beta_min, cfg.beta_max, cfg.num_scales)
        self.tx = make_optimizer(
            cfg.lr, cfg.warmup, cfg.grad_clip, cfg.weight_decay,
            mu_dtype=cfg.mu_dtype,
        )
        self.feature_mask = feature_mask
        self.occ_mask = occ_mask
        self.mesh = mesh if mesh is not None else make_mesh()

        def apply_fn(params, x, occ, labels, train=False, rngs=None):
            return self.model.apply(
                {"params": params},
                x,
                occ,
                labels,
                feature_mask=feature_mask,
                pixcat_mask=None,
                occ_mask=occ_mask,
                train=train,
                rngs=rngs,
            )

        self.apply_fn = apply_fn
        self.loss_fn = make_ddpm_loss_fn(
            self.sde, apply_fn, feature_mask=feature_mask, occ_mask=occ_mask
        )

    # ---------------- init ----------------
    def init_state(self, key: jax.Array) -> DiffusionTrainState:
        # Init at a small spatial proxy: flax init EXECUTES the forward pass,
        # and a full f32 (1,128³,4)+(1,256³,1) forward OOMs one 16 GB chip
        # before training even starts.  The UNet is fully convolutional —
        # params depend only on channel dims — so a 32³ init (the minimum for
        # the 2⁵ down path) yields bit-identical param shapes at any grid.
        d = min(self.cfg.grid_size, 32)
        x = jnp.zeros((1, d, d, d, self.cfg.data_ch))
        occ = jnp.zeros((1, 2 * d, 2 * d, 2 * d, 1)) if self.cfg.use_occ else None
        variables = self.model.init(
            {"params": key}, x, occ, jnp.zeros((1,), jnp.int32), train=False
        )
        params = variables["params"]
        state = DiffusionTrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema=ema_init(params, dtype=self.cfg.ema_dtype),
            step=jnp.zeros((), jnp.int32),
        )
        # replicate params across the mesh; batches get sharded per step.
        # Single-device mesh: skip the put — tree_map(device_put) would hold
        # a full second copy of the 6.6 GB reference-size state while the
        # originals are still referenced, and the transient doubling is what
        # pushes the (4,128³)+(1,256³) working point over one chip's HBM.
        if self.mesh.size == 1 and (
            self.mesh.devices.flat[0] == jax.devices()[0]
        ):
            # Only safe to skip when the mesh's single device IS the default
            # device flax init already placed the params on; a mesh over a
            # non-default device must still get the explicit put.
            return state
        rep = replicated(self.mesh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)

    # ---------------- train step ----------------
    # state is DONATED: params+moments+EMA of the reference-size UNet are
    # 6.6 GB f32 — without donation old and new state coexist and the
    # 411M-param model cannot step on one 16 GB chip.
    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: DiffusionTrainState, key: jax.Array, batch: dict):
        """batch: {'grid': (A, B, D, D, D, C), 'occgrid': (A, B, ...)} with A =
        num_grad_acc_steps microbatches, each sharded over the data axis.
        One jitted step = scan microbatches, mean grads, one optimizer step —
        the reference's no_sync() inner loop (trainer_ddp.py:133-158)."""

        a = self.cfg.num_grad_acc_steps
        lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if lead != a:
            # Shapes are static under jit, so this is a trace-time check.
            # Both branches would otherwise mis-handle a mismatch silently:
            # a==1 drops microbatches [1:], a>1 scans `lead` times but
            # divides by `a`.
            raise ValueError(
                f"batch leading (accumulation) axis is {lead} but "
                f"num_grad_acc_steps={a}"
            )
        if a == 1:
            # Single microbatch: skip the scan so no params-sized zero
            # accumulator is materialized (1.6 GB f32 at the reference
            # 411M-param UNet — the difference between fitting and OOM on
            # one 16 GB chip at the (4,128³)+(1,256³) working point).
            _, sub = jax.random.split(key)
            mb = jax.tree_util.tree_map(lambda t: t[0], batch)
            loss_sum, g_sum = jax.value_and_grad(self.loss_fn)(
                state.params, sub, mb
            )
        else:
            def micro(carry, mb):
                g_acc, l_acc, k = carry
                k, sub = jax.random.split(k)
                loss, g = jax.value_and_grad(self.loss_fn)(state.params, sub, mb)
                g_acc = jax.tree_util.tree_map(lambda a_, b: a_ + b, g_acc, g)
                return (g_acc, l_acc + loss, k), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (g_sum, loss_sum, _), _ = jax.lax.scan(
                micro, (zeros, 0.0, key), batch
            )
        grads = jax.tree_util.tree_map(lambda g: g / a, g_sum)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, self.cfg.ema_rate)
        new_state = DiffusionTrainState(
            params=params, opt_state=opt_state, ema=ema, step=state.step + 1
        )
        return new_state, {"loss": loss_sum / a}

    # ---------------- segmented train step (cfg.segmented_grad) ----------
    # Four separately-compiled programs chained in Python.  Exact parity
    # with train_step: sample_perturbation reuses the same key splits, and
    # flax dropout folds by module PATH (identical across segments), so
    # every stochastic draw matches the monolithic step bit-for-bit.

    def _masks_like(self, noise, noise_occ):
        fm = self.feature_mask
        om = self.occ_mask
        if fm is None:
            fm = jnp.ones_like(noise[:1])
        if om is None and noise_occ is not None:
            om = jnp.ones_like(noise_occ[:1])
        return fm, om

    @partial(jax.jit, static_argnums=(0,))
    def _seg_down_fwd(self, params, key, mb):
        from ..models.losses import sample_perturbation

        labels, noise, pert, noise_occ, pert_occ, k_drop = sample_perturbation(
            self.sde, key, mb["grid"], mb.get("occgrid")
        )
        h, hs, temb = self.model.apply(
            {"params": params}, pert, pert_occ, labels,
            feature_mask=self.feature_mask, occ_mask=self.occ_mask,
            train=True, rngs={"dropout": k_drop}, segment="down",
            up_split=self.cfg.segmented_up_split,
            up_split_blocks=self.cfg.segmented_up_split_blocks,
        )
        return h, hs, temb, noise, noise_occ, k_drop

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3, 4, 5, 6))
    def _seg_up_grad(self, params, h, hs, temb, noise, noise_occ, k_drop):
        from ..models.losses import masked_score_mse

        fm, om = self._masks_like(noise, noise_occ)
        b = noise.shape[0]

        # Differentiate w.r.t. ONLY the up-subtree params (up_param_names):
        # the full-tree gradient is ~1.6 GB of mostly zeros at the
        # reference UNet (the down leaves never feed the up segment), and
        # it would stay RESIDENT through down_bwd — the per-program compile
        # checks cannot see cross-program residency, so this is pure peak-
        # HBM relief (~30 MB subtree at up_split=5).  p_up's leaves alias
        # params' buffers (dict re-pack, no copy).
        from ..models.unet3d import up_param_names

        up_keys = sorted(
            up_param_names(self.unet_cfg, self.cfg.segmented_up_split,
                           self.cfg.segmented_up_split_blocks)
        )

        def up_loss(p_up, h_, hs_, temb_):
            merged = {**params, **p_up}
            pred, pred_occ = self.model.apply(
                {"params": merged}, None, None, None,
                feature_mask=fm, occ_mask=om,
                train=True, rngs={"dropout": k_drop}, segment="up",
                h_in=h_, hs_in=hs_, temb_in=temb_,
                up_split=self.cfg.segmented_up_split,
                up_split_blocks=self.cfg.segmented_up_split_blocks,
            )
            return masked_score_mse(
                pred, pred_occ, noise, noise_occ, fm, om, b
            )

        p_up = {k: params[k] for k in up_keys}
        loss, (gp_up, g_h, g_hs, g_temb) = jax.value_and_grad(
            up_loss, argnums=(0, 1, 2, 3)
        )(p_up, h, hs, temb)
        return loss, gp_up, g_h, g_hs, g_temb

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(4, 5, 6))
    def _seg_down_bwd(self, params, key, mb, g_h, g_hs, g_temb):
        from ..models.losses import sample_perturbation

        labels, _, pert, _, pert_occ, k_drop = sample_perturbation(
            self.sde, key, mb["grid"], mb.get("occgrid")
        )

        def down_fn(p):
            return self.model.apply(
                {"params": p}, pert, pert_occ, labels,
                feature_mask=self.feature_mask, occ_mask=self.occ_mask,
                train=True, rngs={"dropout": k_drop}, segment="down",
                up_split=self.cfg.segmented_up_split,
            up_split_blocks=self.cfg.segmented_up_split_blocks,
            )

        _, vjp = jax.vjp(down_fn, params)
        (gp,) = vjp((g_h, g_hs, g_temb))
        return gp

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2, 3))
    def _seg_update(self, state, gp_up, gp_down, loss):
        # gp_up holds only the up-subtree (up_param_names); gp_down is the
        # full tree whose up leaves are the symbolic-zero cotangents of the
        # down segment — merge by addition on the subtree.
        grads = dict(gp_down)
        for k, g in gp_up.items():
            grads[k] = jax.tree_util.tree_map(jnp.add, grads[k], g)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, self.cfg.ema_rate)
        new_state = DiffusionTrainState(
            params=params, opt_state=opt_state, ema=ema, step=state.step + 1
        )
        return new_state, {"loss": loss}

    def train_step_segmented(self, state, key, batch):
        """Drop-in for train_step at configs the monolithic program cannot
        compile (128³).  num_grad_acc_steps must be 1."""
        if self.cfg.num_grad_acc_steps != 1:
            raise ValueError("segmented_grad supports num_grad_acc_steps=1")
        lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if lead != 1:
            raise ValueError(
                f"batch leading (accumulation) axis is {lead}, expected 1"
            )
        _, sub = jax.random.split(key)
        mb = jax.tree_util.tree_map(lambda t: t[0], batch)
        h, hs, temb, noise, noise_occ, k_drop = self._seg_down_fwd(
            state.params, sub, mb
        )
        loss, gp_up, g_h, g_hs, g_temb = self._seg_up_grad(
            state.params, h, hs, temb, noise, noise_occ, k_drop
        )
        gp_down = self._seg_down_bwd(state.params, sub, mb, g_h, g_hs, g_temb)
        return self._seg_update(state, gp_up, gp_down, loss)

    # ---------------- checkpointing (ref trainer.py:48-55, utils.py:6-47) ---
    def save_checkpoint(self, path: str, state: DiffusionTrainState):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str, state: DiffusionTrainState):
        """Graceful restore: returns ``state`` unchanged if no checkpoint
        (ref utils.py:6-36).

        Checkpoint-format migration: GroupNormF32 was rewritten from a
        wrapper around ``nn.GroupNorm`` (params at
        ``GroupNormF32_i/GroupNorm_0/{scale,bias}``) to a hand-rolled module
        holding ``{scale,bias}`` directly.  Numerics are identical, but the
        pytree structure changed, so checkpoints saved before that commit no
        longer match the template.  On a structure mismatch we retry against
        the OLD layout and rename the leaves forward."""
        import orbax.checkpoint as ocp

        if not os.path.exists(path):
            return state
        ckptr = ocp.StandardCheckpointer()
        try:
            return ckptr.restore(os.path.abspath(path), state)
        except Exception:
            old_state = _wrap_groupnorm_template(state)
            restored = ckptr.restore(os.path.abspath(path), old_state)
            return _unwrap_groupnorm(restored)
