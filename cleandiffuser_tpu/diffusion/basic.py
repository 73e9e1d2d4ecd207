"""DiffusionModel base — functional JAX core with a stateful parity wrapper.

TPU-native re-design of reference cleandiffuser/diffusion/basic.py:14-103.
Differences from the reference (by design, for TPU/XLA):

- Model state is one immutable PyTree (`TrainState`: params, EMA params,
  optimizer state, step, PRNG) instead of nn.ModuleDict + deepcopy twin.
- `update` compiles to ONE XLA program: loss + grad + AdamW + EMA lerp are
  fused; the EMA update costs one extra elementwise pass instead of a
  Python loop over parameters (reference basic.py:83-86).
- Modules are lazily initialized from the first batch's shapes (flax needs
  example inputs), so the constructor signature matches the reference.
- Checkpoints include optimizer state + RNG, so resume is exact (the
  reference drops optimizer state, SURVEY.md §5.4).

The stateful wrapper keeps the reference call surface
(`agent.update(x0, cond)`, `agent.sample(prior, ...)`, `agent.save/load`)
while every hot path is a cached jitted pure function.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..nn_condition.base import IdentityCondition
from ..utils.train_state import (
    TrainState,
    ema_update,
    load_state,
    make_optimizer,
    save_state,
)

__all__ = ["DiffusionModel"]


from ..utils.tensors import host_constants  # noqa: F401 (re-export)


def bf16_cast(tree):
    """Cast a pytree's floating leaves to bfloat16 (ints/keys untouched)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


class DiffusionModel:
    # Samplers cast params + network forward to bfloat16 (MXU-native) when
    # set; solver math stays float32. Class-level default so the
    # `bf16_sampling=true` config key (applied at the setup_mesh chokepoint,
    # parallel/integrate.py) reaches every engine; instances may override.
    bf16_sampling = False
    # Mixed-precision TRAINING: net forward/backward in bf16 (the cast is
    # differentiable — grads come back f32 through the cast-back), while
    # loss, optimizer state, master weights, and the EMA stay f32.
    # `bf16_training=true` config key, same chokepoint.
    # MEASURED NEGATIVE on TPU v5e (tools/bench_bf16_analysis.py): XLA's
    # default-precision f32 matmuls already run the MXU as bf16 passes, so
    # casting wins no FLOPs and pays conversion traffic (DiT step 0.88x,
    # ChiUNet 0.58x). Keep OFF for speed; use only for HBM-capacity relief.
    bf16_training = False

    def __init__(
        self,
        nn_diffusion,
        nn_condition=None,
        fix_mask: Union[list, np.ndarray, jnp.ndarray, None] = None,
        loss_weight: Union[list, np.ndarray, jnp.ndarray, None] = None,
        classifier=None,
        grad_clip_norm: Optional[float] = None,
        diffusion_steps: int = 1000,
        ema_rate: float = 0.995,
        optim_params: Optional[dict] = None,
        rng: Union[int, jax.Array] = 0,
        # `device` accepted for config parity with the reference; unused
        # (JAX manages placement).
        device: Any = None,
    ):
        del device
        optim_params = dict(optim_params or {"lr": 2e-4, "weight_decay": 1e-5})

        self.grad_clip_norm = grad_clip_norm
        self.diffusion_steps = diffusion_steps
        self.ema_rate = ema_rate

        self.nn_diffusion = nn_diffusion
        self.nn_condition = nn_condition if nn_condition is not None else IdentityCondition()
        self.classifier = classifier

        with host_constants():
            self.fix_mask = (
                jnp.asarray(fix_mask, dtype=jnp.float32)[None] if fix_mask is not None else 0.0
            )
            self.loss_weight = (
                jnp.asarray(loss_weight, dtype=jnp.float32)[None] if loss_weight is not None else 1.0
            )

        self.tx = make_optimizer(grad_clip_norm=grad_clip_norm, **optim_params)

        self._root_rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        self._root_rng, self._sample_rng = jax.random.split(self._root_rng)
        self.state: Optional[TrainState] = None
        self._fn_cache: dict = {}

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def t_example(self, batch: int) -> jnp.ndarray:
        """Example timestep array used for lazy init; engines override dtype."""
        return jnp.zeros((batch,), jnp.float32)

    def init(self, x_example, condition_example=None) -> TrainState:
        """Initialize parameters from example inputs (shapes only matter)."""
        x_example = jnp.asarray(x_example)
        b = x_example.shape[0]
        self._root_rng, kd, kc, ks = jax.random.split(self._root_rng, 4)
        has_cond = condition_example is not None
        cond_tree = (
            jax.tree_util.tree_map(jnp.asarray, condition_example) if has_cond else None
        )

        # jit the whole init: eager flax init issues hundreds of small device
        # ops, which is pathological over a high-latency device link
        def build(kd, kc, x_example, cond_tree):
            if has_cond:
                cond_params = self.nn_condition.init(
                    {"params": kc, "dropout": kc}, cond_tree, train=False
                )
                emb_example = self.nn_condition.apply(cond_params, cond_tree, train=False)
            else:
                cond_params = {}
                emb_example = None
            diff_params = self.nn_diffusion.init(
                {"params": kd, "dropout": kd}, x_example, self.t_example(b), emb_example,
                train=False,
            )
            return {"diffusion": diff_params, "condition": cond_params}

        def build_state(kd, kc, ks, x_example, cond_tree):
            params = build(kd, kc, x_example, cond_tree)
            return TrainState.create(params, self.tx, ks)

        self.state = jax.jit(build_state)(kd, kc, ks, x_example, cond_tree)
        return self.state

    def _ensure_init(self, x0, condition=None):
        if self.state is None:
            self.init(x0, condition)

    # ------------------------------------------------------------------
    # Module application helpers (pure; used inside jitted programs)
    # ------------------------------------------------------------------
    def apply_condition(self, params, condition, mask=None, train=False, rng=None):
        """Run nn_condition; None passes through (backbone substitutes zeros)."""
        if condition is None:
            return None
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.nn_condition.apply(
            params["condition"], condition, mask=mask, train=train, rngs=rngs
        )

    def apply_diffusion(self, params, x, t, emb, train=False, rng=None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if (self.bf16_sampling if not train else self.bf16_training):
            # bf16 net forward, every engine: inputs/params cast here
            # (no-ops when the caller pre-cast them), prediction cast back
            # so solver/loss math stays f32. Under train the casts are
            # differentiated through, so grads arrive f32 at the optimizer.
            out = self.nn_diffusion.apply(
                bf16_cast(params["diffusion"]), x.astype(jnp.bfloat16), t,
                bf16_cast(emb) if emb is not None else None,
                train=train, rngs=rngs)
            return out.astype(jnp.float32)
        return self.nn_diffusion.apply(params["diffusion"], x, t, emb, train=train, rngs=rngs)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def loss_fn(self, params, rng, x0, condition, weighted_regression=None):
        raise NotImplementedError

    def _make_update_fn(self, update_ema: bool, has_wrt: bool):
        def update_fn(state: TrainState, x0, condition, wrt):
            rng, sub = jax.random.split(state.rng)

            def loss_of(params):
                return self.loss_fn(params, sub, x0, condition, wrt if has_wrt else None)

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            grad_norm = optax_global_norm(grads)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            ema_params = (
                ema_update(params, state.ema_params, self.ema_rate)
                if update_ema
                else state.ema_params
            )
            new_state = state.replace(
                params=params,
                ema_params=ema_params,
                opt_state=opt_state,
                step=state.step + 1,
                rng=rng,
            )
            return new_state, {"loss": loss, "grad_norm": grad_norm}

        return jax.jit(update_fn, donate_argnums=0)

    def update(self, x0, condition=None, update_ema: bool = True, **kwargs):
        """One fused gradient + EMA step. Returns a log dict of floats."""
        self._ensure_init(x0, condition)
        wrt = kwargs.get("weighted_regression_tensor", None)
        key = ("update", update_ema, wrt is not None, condition is None)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._make_update_fn(update_ema, wrt is not None)
        self.state, log = self._fn_cache[key](self.state, jnp.asarray(x0), condition, wrt)
        # return DEVICE scalars: float() here would force one ~30ms host
        # sync per train step through the tunnel; loops accumulate on device
        # and fetch once per log window (runner.train_loop)
        return log

    def ema_update(self):
        self.state = self.state.replace(
            ema_params=ema_update(self.state.params, self.state.ema_params, self.ema_rate)
        )

    def update_classifier(self, x0, condition):
        xt, t, eps = self.add_noise_host(jnp.asarray(x0))
        return self.classifier.update(xt, t, condition)

    # ------------------------------------------------------------------
    # Sampling interface (engines implement)
    # ------------------------------------------------------------------
    def sample(self, *args, **kwargs):
        raise NotImplementedError

    def next_sample_rng(self) -> jax.Array:
        self._sample_rng, sub = jax.random.split(self._sample_rng)
        return sub

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------
    def save(self, path: str):
        save_state(self.state, path)

    def load(self, path: str):
        self.state = load_state(path, like=self.state)

    # parity no-ops: train/eval mode is explicit (`train=` flags) in JAX
    def train(self):
        return self

    def eval(self):
        return self


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
