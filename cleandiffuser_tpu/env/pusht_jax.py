"""PushT environment — pure-JAX vectorized reimplementation.

TPU-native replacement for the reference pymunk/pygame PushT
(reference cleandiffuser/env/pusht/pusht_env.py:28-367). The reference
steps one env per subprocess through pymunk; here `step` is a pure jittable
function over a batch of env states, so policy sampling and env stepping
never leave the device (BASELINE.json north star).

Faithful elements:
- World 512x512 with walls at [5, 506]; agent circle r=15; T-block of
  scale 30 (120x30 bar + 30x90 stem); goal pose (256, 256, pi/4); PD agent
  control (k_p=100, k_v=20) at sim 100 Hz / control 10 Hz (10 substeps);
  success threshold 0.95 coverage; obs = [agent_x, agent_y, block_x,
  block_y, block_angle mod 2pi]; reset state distribution matches
  (agent in [50,450]^2, block in [100,400]^2, angle ~ N(0,1)*2pi - pi).

Approximations (documented deviations):
- pymunk's impulse solver is replaced by a quasi-static contact model:
  space.damping=0 in the reference zeroes block momentum each step, so the
  block only moves while pushed; we resolve circle-vs-T penetration with a
  mass-split positional correction + torque from the contact offset.
- Coverage reward uses containment sampling over a fixed grid of points in
  the goal T (exact polygon intersection needs shapely, unavailable here);
  with the default 32x32-per-rect grid the error is < ~1%.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PushTState", "PushTEnvJax", "PushTKeypointEnvJax"]

WS = 512.0
SCALE = 30.0
LENGTH = 4.0
AGENT_R = 15.0
K_P, K_V = 100.0, 20.0
SIM_HZ, CONTROL_HZ = 100, 10
SUCCESS_THRESHOLD = 0.95
GOAL_POSE = np.array([256.0, 256.0, np.pi / 4], np.float32)

# T-block local geometry (reference pusht_env.py:342-358):
#   bar:  x in [-60, 60], y in [0, 30]
#   stem: x in [-15, 15], y in [30, 120]
BAR = np.array([-LENGTH * SCALE / 2, 0.0, LENGTH * SCALE / 2, SCALE], np.float32)
STEM = np.array([-SCALE / 2, SCALE, SCALE / 2, LENGTH * SCALE], np.float32)

# center of gravity offset: average of the two shape centroids
_COG = np.array(
    [
        ((BAR[0] + BAR[2]) / 2 + (STEM[0] + STEM[2]) / 2) / 2,
        ((BAR[1] + BAR[3]) / 2 + (STEM[1] + STEM[3]) / 2) / 2,
    ],
    np.float32,
)

_BLOCK_MASS = 1.0
_AGENT_MASS = 1.0


def _moment_for_box(mass, w, h, centroid, cog):
    d = np.asarray(centroid) - np.asarray(cog)
    return mass / 12.0 * (w**2 + h**2) + mass * (d**2).sum()


_BLOCK_INERTIA = float(
    _moment_for_box(0.5, BAR[2] - BAR[0], BAR[3] - BAR[1],
                    [(BAR[0] + BAR[2]) / 2, (BAR[1] + BAR[3]) / 2], _COG)
    + _moment_for_box(0.5, STEM[2] - STEM[0], STEM[3] - STEM[1],
                      [(STEM[0] + STEM[2]) / 2, (STEM[1] + STEM[3]) / 2], _COG)
)


def _coverage_grid(n: int = 32) -> np.ndarray:
    """Sample points filling the two T rectangles in local frame."""
    pts = []
    for rect in (BAR, STEM):
        xs = np.linspace(rect[0], rect[2], n, endpoint=False) + (rect[2] - rect[0]) / n / 2
        ys = np.linspace(rect[1], rect[3], n, endpoint=False) + (rect[3] - rect[1]) / n / 2
        g = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        pts.append(g)
    return np.concatenate(pts, 0).astype(np.float32)


_GRID = _coverage_grid()

# 9 keypoints for the keypoint variant (corners + junctions of the T)
KEYPOINTS_LOCAL = np.array(
    [
        [BAR[0], BAR[1]], [BAR[2], BAR[1]], [BAR[0], BAR[3]], [BAR[2], BAR[3]],
        [STEM[0], STEM[3]], [STEM[2], STEM[3]],
        [STEM[0], STEM[1]], [STEM[2], STEM[1]],
        [0.0, 0.0],
    ],
    np.float32,
)


class PushTState(NamedTuple):
    agent_pos: jnp.ndarray  # (..., 2)
    agent_vel: jnp.ndarray  # (..., 2)
    block_pos: jnp.ndarray  # (..., 2) body-origin position
    block_angle: jnp.ndarray  # (...,)


def _rot(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def _world_to_block(p, block_pos, block_angle):
    """World point -> block local frame."""
    R = _rot(-block_angle)
    return (R @ (p - block_pos)[..., None])[..., 0]


def _block_to_world(p, block_pos, block_angle):
    R = _rot(block_angle)
    return (R @ p[..., None])[..., 0] + block_pos


def _sd_box(p, rect):
    """Signed distance of point p (local frame) to an axis-aligned rect.
    Negative inside."""
    cx = (rect[0] + rect[2]) / 2
    cy = (rect[1] + rect[3]) / 2
    hx = (rect[2] - rect[0]) / 2
    hy = (rect[3] - rect[1]) / 2
    q = jnp.abs(p - jnp.array([cx, cy])) - jnp.array([hx, hy])
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.maximum(q[..., 0], q[..., 1]), 0.0)
    return outside + inside


def _sd_tee_local(p):
    """Signed distance of a local-frame point to the T shape."""
    return jnp.minimum(_sd_box(p, jnp.asarray(BAR)), jnp.asarray(_sd_box(p, jnp.asarray(STEM))))


class PushTEnvJax:
    """Vectorized pure-JAX PushT. All methods are jittable/vmappable.

    Usage:
        env = PushTEnvJax()
        state, obs = env.reset(rng, batch)        # batch envs at once
        state, obs, rew, done = env.step(state, action)
    """

    obs_dim = 5
    act_dim = 2

    def __init__(self, coverage_grid_n: int = 32):
        self.grid = jnp.asarray(_coverage_grid(coverage_grid_n))
        self.goal_pose = jnp.asarray(GOAL_POSE)
        # precompute goal-frame world points of the T
        self.goal_pts = _block_to_world(
            self.grid, self.goal_pose[:2], self.goal_pose[2]
        )

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, rng: jax.Array, batch: int = 1,
              reset_to_state: Optional[jnp.ndarray] = None):
        if reset_to_state is None:
            k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
            ax = jax.random.randint(k1, (batch,), 50, 450).astype(jnp.float32)
            ay = jax.random.randint(k2, (batch,), 50, 450).astype(jnp.float32)
            bx = jax.random.randint(k3, (batch,), 100, 400).astype(jnp.float32)
            by = jax.random.randint(k4, (batch,), 100, 400).astype(jnp.float32)
            th = jax.random.normal(k5, (batch,)) * 2 * jnp.pi - jnp.pi
        else:
            s = jnp.broadcast_to(reset_to_state, (batch, 5))
            ax, ay, bx, by, th = s[:, 0], s[:, 1], s[:, 2], s[:, 3], s[:, 4]
        state = PushTState(
            agent_pos=jnp.stack([ax, ay], -1),
            agent_vel=jnp.zeros((batch, 2)),
            block_pos=jnp.stack([bx, by], -1),
            block_angle=th,
        )
        return state, self.get_obs(state)

    # ------------------------------------------------------------------
    def get_obs(self, state: PushTState):
        return jnp.concatenate(
            [
                state.agent_pos,
                state.block_pos,
                (state.block_angle % (2 * jnp.pi))[..., None],
            ],
            axis=-1,
        )

    # ------------------------------------------------------------------
    def _substep(self, state: PushTState, action, dt):
        # PD control (reference pusht_env.py:113-117)
        acc = K_P * (action - state.agent_pos) + K_V * (-state.agent_vel)
        vel = state.agent_vel + acc * dt
        pos = state.agent_pos + vel * dt

        # circle-vs-T contact (quasi-static block response)
        p_local = _world_to_block(pos, state.block_pos, state.block_angle)
        sd = _sd_tee_local(p_local)
        pen = AGENT_R - sd  # >0 means contact

        eps = 0.5
        grad = jnp.stack(
            [
                _sd_tee_local(p_local + jnp.array([eps, 0.0]))
                - _sd_tee_local(p_local - jnp.array([eps, 0.0])),
                _sd_tee_local(p_local + jnp.array([0.0, eps]))
                - _sd_tee_local(p_local - jnp.array([0.0, eps])),
            ],
            -1,
        ) / (2 * eps)
        n_local = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-8)
        R = _rot(state.block_angle)
        n_world = (R @ n_local[..., None])[..., 0]  # outward normal toward agent

        contact = pen > 0.0
        pen_pos = jnp.maximum(pen, 0.0)

        # mass-split positional correction: agent pushed out along +n,
        # block pushed along -n
        w_a = _BLOCK_MASS / (_AGENT_MASS + _BLOCK_MASS)
        w_b = _AGENT_MASS / (_AGENT_MASS + _BLOCK_MASS)
        pos = pos + jnp.where(contact[..., None], pen_pos[..., None] * n_world * w_a, 0.0)
        block_pos = state.block_pos - jnp.where(
            contact[..., None], pen_pos[..., None] * n_world * w_b, 0.0
        )

        # torque: contact point at the circle surface toward the block
        contact_pt = pos - n_world * AGENT_R
        cog_world = _block_to_world(jnp.asarray(_COG), block_pos, state.block_angle)
        r_vec = contact_pt - cog_world
        force = -n_world * pen_pos[..., None] * _BLOCK_MASS  # impulse-like
        torque = r_vec[..., 0] * force[..., 1] - r_vec[..., 1] * force[..., 0]
        block_angle = state.block_angle + jnp.where(
            contact, torque / _BLOCK_INERTIA, 0.0
        )

        # remove agent velocity along the contact normal (inelastic)
        vn = (vel * n_world).sum(-1, keepdims=True)
        vel = jnp.where(
            contact[..., None] & (vn < 0), vel - vn * n_world, vel
        )

        # wall clamping (segments at 5..506)
        pos = jnp.clip(pos, 5.0 + AGENT_R, WS - 6.0 - AGENT_R)

        return PushTState(pos, vel, block_pos, block_angle)

    @partial(jax.jit, static_argnums=0)
    def step(self, state: PushTState, action: jnp.ndarray
             ) -> Tuple[PushTState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        dt = 1.0 / SIM_HZ
        n_steps = SIM_HZ // CONTROL_HZ

        def body(s, _):
            return self._substep(s, action, dt), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        coverage = self.coverage(state)
        reward = jnp.clip(coverage / SUCCESS_THRESHOLD, 0.0, 1.0)
        done = coverage > SUCCESS_THRESHOLD
        return state, self.get_obs(state), reward, done

    # ------------------------------------------------------------------
    def coverage(self, state: PushTState):
        """Fraction of the goal T covered by the current block T."""
        # goal points in world -> current block local frame
        gp = self.goal_pts  # (P, 2)
        bp = state.block_pos[..., None, :]
        ba = state.block_angle[..., None]
        local = _world_to_block(gp, bp, ba)  # (..., P, 2)
        inside = _sd_tee_local(local) <= 0.0
        return inside.mean(axis=-1)

    # ------------------------------------------------------------------
    def keypoints(self, state: PushTState):
        """(..., 9, 2) world-frame keypoints of the block."""
        kp = jnp.asarray(KEYPOINTS_LOCAL)
        return _block_to_world(
            kp, state.block_pos[..., None, :], state.block_angle[..., None]
        )

    def render_state(self, state: PushTState, size: int = 96):
        """Rasterize one env state to (size, size, 3) uint8 via SDF tests —
        pure JAX, so image observations also stay on device."""
        ys, xs = jnp.meshgrid(
            jnp.linspace(0, WS, size), jnp.linspace(0, WS, size), indexing="ij"
        )
        pts = jnp.stack([xs, ys], -1)  # (H, W, 2) world coords

        img = jnp.ones((size, size, 3)) * 255.0
        # goal T (light green)
        goal_local = _world_to_block(pts, self.goal_pose[:2], self.goal_pose[2])
        in_goal = _sd_tee_local(goal_local) <= 0.0
        img = jnp.where(in_goal[..., None], jnp.array([144.0, 238.0, 144.0]), img)
        # block T (gray)
        local = _world_to_block(pts, state.block_pos, state.block_angle)
        in_block = _sd_tee_local(local) <= 0.0
        img = jnp.where(in_block[..., None], jnp.array([119.0, 136.0, 153.0]), img)
        # agent (royal blue)
        in_agent = jnp.linalg.norm(pts - state.agent_pos, axis=-1) <= AGENT_R
        img = jnp.where(in_agent[..., None], jnp.array([65.0, 105.0, 225.0]), img)
        return img.astype(jnp.uint8)


class PushTKeypointEnvJax(PushTEnvJax):
    """Keypoint-observation variant (reference pusht_keypoints_env.py):
    obs = [9 block keypoints (18) + agent pos (2)] = 20 dims."""

    obs_dim = 20

    def get_obs(self, state: PushTState):
        kp = self.keypoints(state).reshape(*state.block_angle.shape, -1)
        return jnp.concatenate([kp, state.agent_pos], axis=-1)


class PushTImageEnvJax(PushTEnvJax):
    """Image-observation variant (reference pusht_image_env.py): obs is a
    dict {"image": (..., 3, H, W) float in [0,1], "agent_pos": (..., 2)}.
    Rendering is the SDF rasterizer, vmapped over the batch so image
    observations are produced on device."""

    def __init__(self, render_size: int = 96, coverage_grid_n: int = 32):
        super().__init__(coverage_grid_n)
        self.render_size = render_size

    def get_obs(self, state: PushTState):
        imgs = jax.vmap(lambda s: self.render_state(s, self.render_size))(state)
        imgs = jnp.moveaxis(imgs, -1, -3).astype(jnp.float32) / 255.0
        return {"image": imgs, "agent_pos": state.agent_pos}
