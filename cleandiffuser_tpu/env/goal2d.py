"""Goal2D — a hermetic offline-RL benchmark with an ANALYTIC optimum.

This environment exists because d4rl cannot be installed here: it makes
"score parity" falsifiable without external data (VERDICT round 1, next
item 4). The task is a 2-D goal-reach MDP whose optimal return is known in
closed form, so `normalized_score` has an exact 1.0 anchor instead of a
paper number:

  state  s in [-2, 2]^2, obs = s
  action a in [-1, 1]^2 (clipped), s' = clip(s + DT * a)
  reward r = -||s'||            (dense distance-to-goal)
  horizon T = 40, reset s0 ~ U([-1, 1]^2)

The optimal policy saturates BOTH action axes (the action set is a box,
not a ball): each axis decays independently as max(|x_i| - t*DT, 0), so
the optimal return is -sum_t ||(max(|x|-t*DT,0), max(|y|-t*DT,0))|| — see
`optimal_return` (greedy per-step norm minimization is optimal because the
per-step reachable set is a translation-invariant box, so being closer
never shrinks future options). The random anchor is the uniform-policy
expectation, estimated once by a deterministic on-device Monte-Carlo
(`random_return`).

Everything is pure JAX: batched reset/step, analytic scoring, and a fully
on-device policy evaluation loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Goal2DEnv", "optimal_return", "random_return", "expected_optimal_return",
    "evaluate_policy", "normalized_score_fn",
]

DT = 0.1
HORIZON = 40
BOUND = 2.0


class Goal2DState(NamedTuple):
    pos: jnp.ndarray  # (..., 2)


class Goal2DEnv:
    obs_dim = 2
    act_dim = 2
    horizon = HORIZON

    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, rng: jax.Array, batch: int = 1):
        pos = jax.random.uniform(rng, (batch, 2), minval=-1.0, maxval=1.0)
        state = Goal2DState(pos)
        return state, self.get_obs(state)

    def get_obs(self, state: Goal2DState):
        return state.pos

    @partial(jax.jit, static_argnums=0)
    def step(self, state: Goal2DState, action: jnp.ndarray
             ) -> Tuple[Goal2DState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        a = jnp.clip(action, -1.0, 1.0)
        pos = jnp.clip(state.pos + DT * a, -BOUND, BOUND)
        rew = -jnp.linalg.norm(pos, axis=-1)
        done = jnp.zeros(rew.shape, bool)  # fixed-horizon task
        state = Goal2DState(pos)
        return state, self.get_obs(state), rew, done


# ---------------------------------------------------------------------------
def optimal_return(s0: jnp.ndarray, horizon: int = HORIZON) -> jnp.ndarray:
    """Closed-form optimal return from start position(s) s0 (..., 2).

    The action set is the box [-1,1]^2, so the optimal policy saturates
    each axis independently (diagonal speed sqrt(2)*DT): after t steps
    |x_i(t)| = max(|x_i(0)| - t*DT, 0) per axis, giving
    return = -sum_{t=1..T} ||(max(|x|-t*DT,0), max(|y|-t*DT,0))||.
    (Greedy per-step norm minimization is optimal: the reachable box is
    translation-invariant, so closer positions dominate.)
    """
    ax = jnp.abs(s0)  # (..., 2)
    t = jnp.arange(1, horizon + 1, dtype=s0.dtype)
    rem = jnp.maximum(ax[..., None, :] - t[:, None] * DT, 0.0)  # (..., T, 2)
    return -jnp.linalg.norm(rem, axis=-1).sum(-1)


def expected_optimal_return(n_mc: int = 100_000, seed: int = 0) -> float:
    """E[optimal return] under the reset distribution (deterministic MC)."""
    rng = jax.random.PRNGKey(seed)
    s0 = jax.random.uniform(rng, (n_mc, 2), minval=-1.0, maxval=1.0)
    return float(optimal_return(s0).mean())


def evaluate_policy(
    act_fn: Callable[[jax.Array, jax.Array], jax.Array],
    num_envs: int = 64,
    seed: int = 0,
) -> float:
    """Mean episode return of `act_fn(rng, obs) -> action` over a batch of
    episodes. The env loop runs per control step (the policy may be an
    arbitrary host-side callable, e.g. a cached jitted sampler)."""
    env = Goal2DEnv()
    rng = jax.random.PRNGKey(seed)
    rng, k = jax.random.split(rng)
    state, obs = env.reset(k, num_envs)
    total = jnp.zeros((num_envs,))
    for _ in range(HORIZON):
        rng, k = jax.random.split(rng)
        act = act_fn(k, obs)
        state, obs, rew, _ = env.step(state, act)
        total = total + rew
    return float(total.mean())


def random_return(num_envs: int = 4096, seed: int = 0) -> float:
    """Uniform-random-policy anchor, fully on-device."""
    env = Goal2DEnv()

    @jax.jit
    def run(rng):
        rng, k = jax.random.split(rng)
        state, _ = env.reset(k, num_envs)

        def body(carry, k):
            state, total = carry
            a = jax.random.uniform(k, (num_envs, 2), minval=-1.0, maxval=1.0)
            state, _, rew, _ = env.step(state, a)
            return (state, total + rew), None

        keys = jax.random.split(rng, HORIZON)
        (state, total), _ = jax.lax.scan(body, (state, jnp.zeros(num_envs)), keys)
        return total.mean()

    return float(run(jax.random.PRNGKey(seed)))


def normalized_score_fn(n_mc: int = 100_000, seed: int = 0):
    """Returns score(ret) mapping random->0.0 and analytic-optimal->1.0."""
    lo = random_return(seed=seed)
    hi = expected_optimal_return(n_mc=n_mc, seed=seed)

    def score(ret: float) -> float:
        return (ret - lo) / (hi - lo)

    return score
