"""Mock-driven tests for the robomimic env wrappers (VERDICT r1 item 9).

robosuite cannot run here, so `RobomimicLowdimWrapper`/`RobomimicImageWrapper`
are exercised against a stub EnvRobosuite that reproduces the reference's
obs-dict contract (reference robomimic_lowdim_wrapper.py:6-60): these tests
fail if the obs-key concat, image packing, or abs_action round-trip breaks.
"""

import numpy as np
import pytest

from cleandiffuser_tpu.env.robomimic import (
    RobomimicImageWrapper,
    RobomimicLowdimWrapper,
)


class StubEnvRobosuite:
    """Obs-dict contract of robomimic's EnvRobosuite (lift task shapes)."""

    def __init__(self, with_images=False):
        self.with_images = with_images
        self.t = 0

    def _obs(self):
        rs = np.random.RandomState(self.t)
        obs = {
            "object": rs.randn(10).astype(np.float32),
            "robot0_eef_pos": rs.randn(3).astype(np.float32),
            "robot0_eef_quat": rs.randn(4).astype(np.float32),
            "robot0_gripper_qpos": rs.randn(2).astype(np.float32),
        }
        if self.with_images:
            obs["agentview_image"] = rs.randint(
                0, 255, (84, 84, 3)).astype(np.float32)
        return obs

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, action):
        assert action.shape == (7,)
        self.t += 1
        return self._obs(), 0.5, self.t >= 3, {}

    def render(self, mode="rgb_array", height=256, width=256):
        return np.zeros((height, width, 3), np.uint8)


def test_lowdim_wrapper_obs_concat_order():
    env = RobomimicLowdimWrapper(StubEnvRobosuite())
    obs, info = env.reset()
    assert obs.shape == (19,)  # 10 + 3 + 4 + 2, lift lowdim layout
    assert obs.dtype == np.float32
    # concat order must be exactly obs_keys order
    raw = StubEnvRobosuite()._obs()
    expected = np.concatenate([raw["object"], raw["robot0_eef_pos"],
                               raw["robot0_eef_quat"], raw["robot0_gripper_qpos"]])
    np.testing.assert_allclose(obs, expected)

    obs, rew, term, trunc, info = env.step(np.zeros(7, np.float32))
    assert (rew, term, trunc) == (0.5, False, False)
    obs, rew, term, trunc, info = env.step(np.zeros(7, np.float32))
    obs, rew, term, trunc, info = env.step(np.zeros(7, np.float32))
    assert term is True


def test_image_wrapper_packs_chw_float():
    env = RobomimicImageWrapper(StubEnvRobosuite(with_images=True))
    obs, _ = env.reset()
    assert obs["state"].shape == (9,)  # eef_pos + eef_quat + gripper
    img = obs["agentview_image"]
    assert img.shape == (3, 84, 84)  # CHW for the image conditions
    assert 0.0 <= img.min() and img.max() <= 1.0  # rescaled from [0,255]


def test_abs_action_round_trip():
    """undo_transform_action inverts the dataset's abs_action_transform
    (rotation_6d -> axis_angle), the dp_robomimic inference path."""
    from cleandiffuser_tpu.dataset.dataset_utils import RotationTransformer
    from cleandiffuser_tpu.dataset.robomimic import (
        abs_action_transform,
        undo_transform_action,
    )

    rt = RotationTransformer("axis_angle", "rotation_6d")
    rs = np.random.RandomState(0)
    raw = rs.randn(5, 7).astype(np.float32)  # pos(3) rot_axis_angle(3) grip(1)
    raw[:, 3:6] *= 0.5  # keep rotations in a sane range
    transformed = abs_action_transform(raw, rt)
    assert transformed.shape == (5, 10)  # 3 + 6 + 1
    recovered = undo_transform_action(transformed, rt)
    assert recovered.shape == (5, 7)
    np.testing.assert_allclose(recovered[:, :3], raw[:, :3], atol=1e-5)
    np.testing.assert_allclose(recovered[:, 6:], raw[:, 6:], atol=1e-5)
    # axis-angle recovery is up to 2*pi*k on the angle; compare rotations
    r1 = rt.forward(raw[:, 3:6])
    r2 = rt.forward(recovered[:, 3:6])
    np.testing.assert_allclose(r1, r2, atol=1e-4)


def test_dp_robomimic_inference_on_stub(tmp_path):
    """End-to-end: DP act_chunk + undo_transform + lowdim wrapper stepping,
    the dp_robomimic mode=inference path with the env mocked."""
    import jax.numpy as jnp

    from cleandiffuser_tpu.pipelines import DPPipeline

    env = RobomimicLowdimWrapper(StubEnvRobosuite())
    obs, _ = env.reset()
    obs_dim, act_dim = obs.shape[0], 10  # abs_action dim
    pipe = DPPipeline(obs_dim=obs_dim, action_dim=act_dim, horizon=4,
                      obs_steps=2, action_steps=2, nn="chi_unet",
                      diffusion="ddpm", sample_steps=2,
                      gradient_steps=10, rng=0)
    nobs = jnp.asarray(np.stack([obs, obs])[None])  # (1, To, obs_dim)
    chunk = np.asarray(pipe.act_chunk(nobs))
    assert chunk.shape == (1, 2, act_dim)

    from cleandiffuser_tpu.dataset.dataset_utils import RotationTransformer
    from cleandiffuser_tpu.dataset.robomimic import undo_transform_action

    rt = RotationTransformer("axis_angle", "rotation_6d")
    env_actions = undo_transform_action(chunk[0], rt)
    assert env_actions.shape == (2, 7)
    for a in env_actions:
        obs, rew, term, trunc, info = env.step(a.astype(np.float32))
        assert obs.shape == (obs_dim,)
