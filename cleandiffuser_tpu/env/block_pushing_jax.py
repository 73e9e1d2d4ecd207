"""Pure-JAX BlockPush environments.

TPU-native re-design of reference cleandiffuser/env/block_pushing/
(block_pushing.py ~1,092 LoC, block_pushing_multimodal.py ~802 LoC,
oracles/ — a pybullet xArm simulation; pybullet is unavailable here and no
reference pipeline consumes the env, only BlockPushDataset). This module
keeps the parts the data/learning stack actually contracts on:

- the 16-dim multimodal observation layout of the released
  `multimodal_push_seed.zarr` demos (block/block2 translation+orientation,
  effector + effector-target translation, target/target2
  translation+orientation) — see dataset/block_push.py;
- 2-dim effector-displacement actions;
- per-block target rewards (0.49 / 0.51 split, success when both blocks
  rest in distinct targets) as in block_pushing_multimodal.py;
- a scripted multimodal oracle for demo generation (reference oracles/).

The xArm arm dynamics are abstracted to a planar velocity-limited effector
with quasi-static circle-vs-square contact (same contact model as
env/pusht_jax.py) — all jittable/vmappable, so rollouts batch on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlockPushState", "BlockPushMultimodalEnvJax", "BlockPushEnvJax",
           "generate_blockpush_demos", "generate_blockpush_reach_demos",
           "generate_blockpush_discontinuous_demos"]

# workspace (meters, matching the reference's tabletop scale).
# numpy, NOT jnp: module-level jnp constants initialize the JAX backend at
# import time, which breaks platform=cpu virtual-mesh CLI runs.
WS_LO = np.array([0.15, -0.35], np.float32)
WS_HI = np.array([0.75, 0.35], np.float32)
BLOCK_HALF = 0.02       # 4 cm blocks
EFFECTOR_R = 0.015
TARGET_R = 0.05         # goal zone radius
STEP_LIMIT = 0.025      # max effector displacement per control step
N_SUB = 4               # contact substeps per control step


class BlockPushState(NamedTuple):
    effector: jnp.ndarray      # (..., 2)
    blocks: jnp.ndarray        # (..., 2, 2) xy per block
    block_angles: jnp.ndarray  # (..., 2)
    targets: jnp.ndarray       # (..., 2, 2) xy per target
    target_angles: jnp.ndarray  # (..., 2)


def _rot(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def _sd_box(p, half):
    q = jnp.abs(p) - half
    return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
            + jnp.minimum(jnp.maximum(q[..., 0], q[..., 1]), 0.0))


class BlockPushMultimodalEnvJax:
    """Two blocks, two targets; obs matches the released demo layout:

        [block0 xy, block0 th, block1 xy, block1 th,
         effector xy, effector-target xy,
         target0 xy, target0 th, target1 xy, target1 th]  = 16 dims
    """

    obs_dim = 16
    act_dim = 2
    n_blocks = 2

    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, rng: jax.Array, batch: int = 1):
        ks = jax.random.split(rng, 4)
        eff = jnp.stack([
            jnp.full((batch,), 0.3),
            jax.random.uniform(ks[0], (batch,), minval=-0.05, maxval=0.05),
        ], -1)
        bx = jax.random.uniform(ks[1], (batch, 2), minval=0.35, maxval=0.45)
        by = (jnp.array([-0.12, 0.12])[None]
              + jax.random.uniform(ks[2], (batch, 2), minval=-0.03, maxval=0.03))
        blocks = jnp.stack([bx, by], -1)
        tx = jnp.full((batch, 2), 0.65)
        ty = jnp.array([-0.2, 0.2])[None] + jnp.zeros((batch, 2))
        targets = jnp.stack([tx, ty], -1)
        angles = jax.random.uniform(ks[3], (batch, 2), minval=-0.3, maxval=0.3)
        state = BlockPushState(
            effector=eff, blocks=blocks, block_angles=angles,
            targets=targets, target_angles=jnp.zeros((batch, 2)),
        )
        return state, self.get_obs(state)

    # ------------------------------------------------------------------
    def get_obs(self, state: BlockPushState):
        b, t = state.blocks, state.targets
        return jnp.concatenate([
            b[..., 0, :], state.block_angles[..., 0:1],
            b[..., 1, :], state.block_angles[..., 1:2],
            state.effector, state.effector,  # effector-target == commanded pos
            t[..., 0, :], state.target_angles[..., 0:1],
            t[..., 1, :], state.target_angles[..., 1:2],
        ], -1)

    # ------------------------------------------------------------------
    def _push_block(self, eff, block, angle):
        """Quasi-static circle-vs-square contact for one block."""
        R = _rot(angle)
        p_local = ((eff - block)[..., None, :] @ R)[..., 0, :]
        sd = _sd_box(p_local, BLOCK_HALF)
        pen = jnp.maximum(EFFECTOR_R - sd, 0.0)
        eps = 1e-4
        gx = (_sd_box(p_local + jnp.array([eps, 0.0]), BLOCK_HALF)
              - _sd_box(p_local - jnp.array([eps, 0.0]), BLOCK_HALF))
        gy = (_sd_box(p_local + jnp.array([0.0, eps]), BLOCK_HALF)
              - _sd_box(p_local - jnp.array([0.0, eps]), BLOCK_HALF))
        n_local = jnp.stack([gx, gy], -1)
        n_local = n_local / (jnp.linalg.norm(n_local, axis=-1, keepdims=True) + 1e-8)
        n_world = (R @ n_local[..., None])[..., 0]
        # block slides away from the effector; small torque from offset
        new_block = block - n_world * pen[..., None]
        lever = p_local[..., 0] * n_local[..., 1] - p_local[..., 1] * n_local[..., 0]
        new_angle = angle - lever * pen * 40.0
        return new_block, new_angle

    @partial(jax.jit, static_argnums=0)
    def step(self, state: BlockPushState, action: jnp.ndarray
             ) -> Tuple[BlockPushState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        delta = jnp.clip(action, -STEP_LIMIT, STEP_LIMIT)

        def substep(carry, _):
            eff, blocks, angles = carry
            eff = jnp.clip(eff + delta / N_SUB, WS_LO, WS_HI)
            b0, a0 = self._push_block(eff, blocks[..., 0, :], angles[..., 0])
            b1, a1 = self._push_block(eff, blocks[..., 1, :], angles[..., 1])
            return (eff, jnp.stack([b0, b1], -2), jnp.stack([a0, a1], -1)), None

        (eff, blocks, angles), _ = jax.lax.scan(
            substep, (state.effector, state.blocks, state.block_angles),
            None, length=N_SUB,
        )
        state = state._replace(effector=eff, blocks=blocks, block_angles=angles)

        # per-block in-any-target reward (0.49/0.51 split, distinct targets
        # for success — reference block_pushing_multimodal.py reward logic)
        d = jnp.linalg.norm(
            blocks[..., :, None, :] - state.targets[..., None, :, :], axis=-1
        )  # (..., block, target)
        in_target = d < TARGET_R
        b0_hit = in_target[..., 0, :].any(-1)
        b1_hit = in_target[..., 1, :].any(-1)
        reward = 0.49 * b0_hit.astype(jnp.float32) + 0.51 * b1_hit.astype(jnp.float32)
        distinct = (
            (in_target[..., 0, 0] & in_target[..., 1, 1])
            | (in_target[..., 0, 1] & in_target[..., 1, 0])
        )
        return state, self.get_obs(state), reward, distinct


class BlockPushEnvJax(BlockPushMultimodalEnvJax):
    """Single-block/single-target variant (reference block_pushing.py):
    same state layout with block1/target1 parked far outside the workspace
    so the 16-dim obs contract is preserved."""

    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, rng: jax.Array, batch: int = 1):
        state, _ = super().reset(rng, batch)
        far = jnp.full((batch, 2), 10.0)
        state = state._replace(
            blocks=state.blocks.at[..., 1, :].set(far),
            targets=state.targets.at[..., 1, :].set(-far),
        )
        return state, self.get_obs(state)


# ---------------------------------------------------------------------------
# Scripted oracle library (reference oracles/: reach_oracle.py,
# oriented_push_oracle.py, multimodal_push_oracle.py,
# discontinuous_push_oracle.py). All are host-side controllers over the
# pure-JAX env; demo generation is a rare offline step, so the per-step
# host fetch is acceptable (run on the CPU backend).


def _push_action(s0, block, target, standoff: float = 0.01):
    """Oriented-push primitive (reference oriented_push_oracle.py): move
    behind the block along the block->target ray, then push through it."""
    push_dir = target - block
    push_dir = push_dir / (np.linalg.norm(push_dir) + 1e-8)
    behind = block - push_dir * (BLOCK_HALF + EFFECTOR_R + standoff)
    to_behind = behind - s0.effector
    if np.linalg.norm(to_behind) > 0.02:
        action = to_behind
    else:
        action = push_dir * STEP_LIMIT
    return np.clip(action, -STEP_LIMIT, STEP_LIMIT).astype(np.float32)


def _rollout_oracle(env, policy_fn, n_episodes, max_steps, seed,
                    mode_fn=None):
    """Roll `policy_fn(s0, t, mode) -> action | None` episodes into a
    ReplayBuffer; `mode_fn(np_rng) -> mode` draws the per-episode latent
    (the multimodality). None action ends the episode (subgoals done)."""
    from ..dataset.replay_buffer import ReplayBuffer

    step_jit = env.step
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    rb = ReplayBuffer.create_empty_numpy()

    for _ in range(n_episodes):
        rng, k = jax.random.split(rng)
        state, obs = env.reset(k, 1)
        mode = mode_fn(np_rng) if mode_fn is not None else None
        obs_l, act_l = [], []
        for t in range(max_steps):
            s0 = jax.tree_util.tree_map(lambda x: np.asarray(x)[0], state)
            action = policy_fn(s0, t, mode)
            if action is None:
                break
            obs_l.append(np.asarray(obs)[0])
            act_l.append(action)
            state, obs, rew, done = step_jit(state, jnp.asarray(action)[None])
            if bool(done[0]):
                obs_l.append(np.asarray(obs)[0])
                act_l.append(np.zeros(2, np.float32))
                break
        rb.add_episode({
            "obs": np.asarray(obs_l, np.float32),
            "action": np.asarray(act_l, np.float32),
        })
    return rb


def generate_blockpush_demos(
    n_episodes: int = 16,
    max_steps: int = 200,
    seed: int = 0,
):
    """Scripted multimodal oracle (reference oracles/multimodal_push_oracle):
    4 latent modes per episode — random block->target ASSIGNMENT x random
    push ORDER (which block is pushed first). Returns an in-memory
    ReplayBuffer with the 16-dim obs / 2-dim action layout."""
    env = BlockPushMultimodalEnvJax()

    def mode_fn(np_rng):
        assign = (0, 1) if np_rng.random() < 0.5 else (1, 0)
        order = (0, 1) if np_rng.random() < 0.5 else (1, 0)
        return (assign, order)

    def policy(s0, t, mode):
        assign, order = mode
        for bi in order:  # first not-yet-done block in this mode's order
            if np.linalg.norm(
                s0.blocks[bi] - s0.targets[assign[bi]]
            ) > TARGET_R * 0.8:
                return _push_action(s0, s0.blocks[bi], s0.targets[assign[bi]])
        return None

    return _rollout_oracle(env, policy, n_episodes, max_steps, seed, mode_fn)


def generate_blockpush_reach_demos(
    n_episodes: int = 16,
    max_steps: int = 120,
    seed: int = 0,
):
    """Reach oracle (reference oracles/reach_oracle.py): drive the effector
    to a randomly chosen target zone without touching the blocks — routes
    via a waypoint outside the block rows (|y| = 0.28 > block y-band
    +-0.15 + contact radii) before closing on the target."""
    env = BlockPushMultimodalEnvJax()

    def mode_fn(np_rng):
        return int(np_rng.integers(2))

    def policy(s0, t, mode):
        target = s0.targets[mode]
        lane_y = np.sign(target[1]) * 0.28
        if abs(s0.effector[1] - lane_y) > 0.02 and s0.effector[0] < target[0] - 0.02:
            goal = np.array([s0.effector[0], lane_y], np.float32)
        elif s0.effector[0] < target[0] - 0.02:
            goal = np.array([target[0], lane_y], np.float32)
        else:
            goal = target
        to_goal = goal - s0.effector
        if np.linalg.norm(target - s0.effector) < 0.01:
            return None
        return np.clip(to_goal, -STEP_LIMIT, STEP_LIMIT).astype(np.float32)

    return _rollout_oracle(env, policy, n_episodes, max_steps, seed, mode_fn)


def generate_blockpush_discontinuous_demos(
    n_episodes: int = 16,
    max_steps: int = 260,
    seed: int = 0,
):
    """Discontinuous-push oracle (reference
    oracles/discontinuous_push_oracle.py + block_pushing_discontinuous.py):
    push the first block only HALFWAY to its target, switch to the second
    block and finish it, then return to complete the first — the
    discontinuity (retreat + re-approach mid-task) is the learning signal
    the reference variant exists for."""
    env = BlockPushMultimodalEnvJax()

    def mode_fn(np_rng):
        assign = (0, 1) if np_rng.random() < 0.5 else (1, 0)
        first = int(np_rng.integers(2))
        return (assign, first, {"half_done": False, "start": None})

    def policy(s0, t, mode):
        assign, first, st = mode
        second = 1 - first
        tgt_f, tgt_s = s0.targets[assign[first]], s0.targets[assign[second]]
        if st["start"] is None:
            st["start"] = s0.blocks[first].copy()
        half_point = 0.5 * (st["start"] + tgt_f)
        if not st["half_done"]:
            # push AT the half point (not the final target): aiming at the
            # target while stopping on half-point proximity lets a lateral
            # miss sail past the stop radius and shove the block into the
            # workspace wall
            if np.linalg.norm(s0.blocks[first] - half_point) > TARGET_R * 0.6:
                return _push_action(s0, s0.blocks[first], half_point)
            st["half_done"] = True
        if np.linalg.norm(s0.blocks[second] - tgt_s) > TARGET_R * 0.8:
            return _push_action(s0, s0.blocks[second], tgt_s)
        if np.linalg.norm(s0.blocks[first] - tgt_f) > TARGET_R * 0.8:
            return _push_action(s0, s0.blocks[first], tgt_f)
        return None

    return _rollout_oracle(env, policy, n_episodes, max_steps, seed, mode_fn)
