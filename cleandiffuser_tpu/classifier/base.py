"""Classifier-guidance stack — functional JAX implementation.

TPU-native re-implementation of reference cleandiffuser/classifier/
(base.py:9-91, mse_classifier.py:10, rew_classifiers.py:7,
qgpo_classifier.py:9). The classifier owns its own TrainState (params + EMA
+ Adam); `gradients` is `jax.grad` of `logp` w.r.t. x_t — inside a sampling
scan this is just another fused segment of the same XLA program, not a
separate autograd graph like the reference's torch.autograd.grad
(classifier/base.py:75-80).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax

from ..utils.train_state import TrainState, ema_update, load_state, save_state

__all__ = ["BaseClassifier", "MSEClassifier", "CumRewClassifier", "QGPOClassifier"]


class BaseClassifier:
    def __init__(
        self,
        nn_classifier,
        ema_rate: float = 0.995,
        grad_clip_norm: Optional[float] = None,
        optim_params: Optional[dict] = None,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        del device
        optim_params = dict(optim_params or {"lr": 2e-4, "weight_decay": 1e-4})
        self.ema_rate, self.grad_clip_norm = ema_rate, grad_clip_norm
        self.nn_classifier = nn_classifier
        chain = []
        if grad_clip_norm is not None:
            chain.append(optax.clip_by_global_norm(grad_clip_norm))
        lr = optim_params.pop("lr", 2e-4)
        wd = optim_params.pop("weight_decay", 0.0)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.adam(learning_rate=lr, **optim_params))
        self.tx = optax.chain(*chain)
        self._root_rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        self.state: Optional[TrainState] = None
        self._fn_cache: dict = {}

    # ------------------------------------------------------------------
    def init(self, x_example, t_example, y_example=None) -> TrainState:
        self._root_rng, k1, k2 = jax.random.split(self._root_rng, 3)
        x_example = jnp.asarray(x_example)
        t_example = jnp.asarray(t_example)
        y_example = (
            jax.tree_util.tree_map(jnp.asarray, y_example) if y_example is not None else None
        )

        def _build(k1, k2, x, t, y):
            params = self.nn_classifier.init({"params": k1, "dropout": k1}, x, t, y)
            return TrainState.create(params, self.tx, k2)

        self.state = jax.jit(_build)(k1, k2, x_example, t_example, y_example)
        return self.state

    def _ensure_init(self, x, t, y=None):
        if self.state is None:
            self.init(x, t, y)

    @property
    def inference_params(self):
        return self.state.ema_params if self.state is not None else None

    # ------------------------------------------------------------------
    # Pure functions (used inside engine sampling programs)
    # ------------------------------------------------------------------
    def apply_nn(self, params, x, t, y=None):
        return self.nn_classifier.apply(params, x, t, y)

    def logp(self, params, x, t, c=None):
        """logp(c | x_t, t) up to a constant; (b, 1)."""
        raise NotImplementedError

    def gradients(self, params, x, t, c=None):
        """(logp, d logp / dx) — both detached (stop_gradient)."""

        def f(xi):
            lp = self.logp(params, xi, t, c)
            return lp.sum(), lp

        grad, logp = jax.grad(f, has_aux=True)(x)
        return jax.lax.stop_gradient(logp), jax.lax.stop_gradient(grad)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def loss(self, params, rng, x, t, y):
        raise NotImplementedError

    def _make_update_fn(self, update_ema: bool):
        def update_fn(state: TrainState, x, t, y):
            rng, sub = jax.random.split(state.rng)

            def loss_of(params):
                out = self.loss(params, sub, x, t, y)
                if isinstance(out, tuple):
                    return out
                return out, {}

            (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = (
                ema_update(params, state.ema_params, self.ema_rate)
                if update_ema
                else state.ema_params
            )
            new_state = state.replace(
                params=params, ema_params=ema_params, opt_state=opt_state,
                step=state.step + 1, rng=rng,
            )
            return new_state, {"loss": loss, **aux}

        return jax.jit(update_fn, donate_argnums=0)

    def update(self, x, noise, y, update_ema: bool = True) -> Dict[str, Any]:
        xe, te, ye = self._init_example(x, noise, y)
        self._ensure_init(xe, te, ye)
        key = ("update", update_ema)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._make_update_fn(update_ema)
        self.state, log = self._fn_cache[key](self.state, x, noise, y)
        # device scalars: see DiffusionModel.update (no per-step host sync)
        return log

    def _init_example(self, x, t, y):
        """(x, t, y) used for lazy init; subclasses with structured labels
        override to produce nn-compatible example inputs."""
        return x, t, y

    # ------------------------------------------------------------------
    def save(self, path: str):
        save_state(self.state, path)

    def load(self, path: str):
        self.state = load_state(path, like=self.state)

    def train(self):
        return self

    def eval(self):
        return self


class MSEClassifier(BaseClassifier):
    """logp = -temperature * MSE(pred_y, y) (reference mse_classifier.py:10)."""

    def __init__(self, nn_classifier, temperature: float = 1.0, **kwargs):
        super().__init__(nn_classifier, **kwargs)
        self.temperature = temperature

    def loss(self, params, rng, x, t, y):
        pred_y = self.apply_nn(params, x, t)
        return ((pred_y - y) ** 2).mean()

    def logp(self, params, x, t, c=None):
        pred_y = self.apply_nn(params, x, t)
        return -self.temperature * ((pred_y - c) ** 2).mean(-1, keepdims=True)


class CumRewClassifier(BaseClassifier):
    """Predicts trajectory return; logp = prediction itself
    (reference rew_classifiers.py:7)."""

    def loss(self, params, rng, x, t, R):
        pred_R = self.apply_nn(params, x, t)
        return ((pred_R - R) ** 2).mean()

    def logp(self, params, x, t, c=None):
        return self.apply_nn(params, x, t)


class QGPOClassifier(BaseClassifier):
    """In-support contrastive energy prediction (CEP)
    (reference qgpo_classifier.py:16-47).

    update() expects x: (b, K, act_dim), t: (b,),
    y = {"soft_label": (b, K, 1), "obs": (b, obs_dim)}.
    """

    def _init_example(self, x, t, y):
        # the energy net consumes (act, t, obs) flat rows
        return x[:, 0, :], t, y["obs"]

    def loss(self, params, rng, x, t, y):
        b, k = x.shape[:2]
        soft_label, obs = y["soft_label"], y["obs"]
        t_k = jnp.repeat(t[:, None], k, axis=1)
        obs_k = jnp.repeat(obs[:, None, :], k, axis=1)
        f = self.apply_nn(params, x, t_k, obs_k)
        loss = -(soft_label * jax.nn.log_softmax(f, axis=1)).sum(1).mean()
        aux = {
            "f_max": jax.lax.stop_gradient(f.max(1).mean()),
            "f_mean": jax.lax.stop_gradient(f.mean()),
            "f_min": jax.lax.stop_gradient(f.min(1).mean()),
        }
        return loss, aux

    def logp(self, params, x, t, c=None):
        return self.apply_nn(params, x, t, c)
