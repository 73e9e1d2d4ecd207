"""Smoke tests for Diffusion Policy and DiffusionBC pipelines, including the
fully on-device receding-horizon PushT evaluation."""

import jax
import numpy as np
import pytest

from cleandiffuser_tpu.dataset import PushTStateDataset, generate_pusht_demos
from cleandiffuser_tpu.env.pusht_jax import PushTEnvJax
from cleandiffuser_tpu.pipelines.dbc import DBCPipeline
from cleandiffuser_tpu.pipelines.dp import DPPipeline


@pytest.fixture(scope="module")
def pusht_ds():
    rb = generate_pusht_demos(n_episodes=3, max_steps=40)
    return PushTStateDataset(rb, horizon=8, pad_before=1, pad_after=3)


@pytest.mark.parametrize("nn", ["chi_unet", "chi_transformer", "dit"])
def test_dp_train_and_chunk(pusht_ds, nn):
    pipe = DPPipeline(
        obs_dim=5, action_dim=2, horizon=8, obs_steps=2, action_steps=4,
        nn=nn, diffusion="ddpm", sample_steps=3, gradient_steps=100,
    )
    rng = jax.random.PRNGKey(0)
    batch = pusht_ds.sample_batch(rng, 8)
    log = pipe.train_step(batch)
    assert np.isfinite(log["loss"])
    chunk = pipe.act_chunk(np.asarray(batch["obs"]["state"][:4]))
    assert chunk.shape == (4, 4, 2)
    assert np.all(np.abs(np.asarray(chunk)) <= 1.0 + 1e-5)


def test_dp_edm(pusht_ds):
    pipe = DPPipeline(
        obs_dim=5, action_dim=2, horizon=8, obs_steps=2, action_steps=4,
        nn="chi_unet", diffusion="edm", sample_steps=3, gradient_steps=100,
    )
    batch = pusht_ds.sample_batch(jax.random.PRNGKey(0), 8)
    log = pipe.train_step(batch)
    assert np.isfinite(log["loss"])


def test_dp_on_device_eval(pusht_ds):
    pipe = DPPipeline(
        obs_dim=5, action_dim=2, horizon=8, obs_steps=2, action_steps=4,
        nn="chi_unet", diffusion="ddpm", sample_steps=2, gradient_steps=100,
    )
    batch = pusht_ds.sample_batch(jax.random.PRNGKey(0), 8)
    pipe.train_step(batch)
    env = PushTEnvJax()
    mean_rew, mean_success = pipe.evaluate_on_device(
        env, pusht_ds.normalizer, num_envs=4, max_episode_steps=16
    )
    assert np.isfinite(mean_rew) and np.isfinite(mean_success)
    assert 0.0 <= mean_success <= 1.0


@pytest.mark.parametrize("nn", ["pearce_mlp", "pearce_transformer"])
def test_dbc(pusht_ds, nn):
    pipe = DBCPipeline(
        obs_dim=5, action_dim=2, obs_steps=2, nn=nn, diffusion="ddpm",
        emb_dim=32, sample_steps=4, gradient_steps=100,
    )
    batch = pusht_ds.sample_batch(jax.random.PRNGKey(0), 8)
    log = pipe.train_step(batch)
    assert np.isfinite(log["loss"])
    act = pipe.act(np.asarray(batch["obs"]["state"][:4, :2]))
    assert act.shape == (4, 2)


def test_dbc_dit_chunk(pusht_ds):
    """dit mode = action-chunk diffusion (reference dbc_pusht.py:166-171,
    94-100): x is (B, Ta, act_dim), condition is the flattened obs window."""
    pipe = DBCPipeline(
        obs_dim=5, action_dim=2, obs_steps=2, action_steps=4, nn="dit",
        diffusion="ddpm", sample_steps=3, gradient_steps=100,
    )
    batch = pusht_ds.sample_batch(jax.random.PRNGKey(0), 8)
    log = pipe.train_step(batch)
    assert np.isfinite(log["loss"])
    act = pipe.act(np.asarray(batch["obs"]["state"][:4, :2]))
    assert act.shape == (4, 2)
    assert np.all(np.abs(np.asarray(act)) <= 1.0 + 1e-5)


def test_pusht_keypoint_combined_normalizer():
    """The keypoint dataset's combined 'state' normalizer == the separate
    keypoint/agent_pos normalizers applied piecewise (per-dim minmax)."""
    from cleandiffuser_tpu.dataset import PushTKeypointDataset

    rb = generate_pusht_demos(n_episodes=2, max_steps=30)
    ds = PushTKeypointDataset(rb, horizon=4, pad_before=1, pad_after=1)
    kp = rb["keypoint"].reshape(len(rb["keypoint"]), -1)
    agent = rb["state"][:, :2]
    combined = ds.normalizer["obs"]["state"].normalize(
        np.concatenate([kp, agent], -1))
    piecewise = np.concatenate(
        [ds.normalizer["obs"]["keypoint"].normalize(kp),
         ds.normalizer["obs"]["agent_pos"].normalize(agent)], -1)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(piecewise),
                               atol=1e-6)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 4)
    assert batch["obs"]["state"].shape[-1] == 20


def test_dbc_diffusion_x(pusht_ds):
    pipe = DBCPipeline(
        obs_dim=5, action_dim=2, obs_steps=2, nn="pearce_mlp", diffusion="ddim",
        emb_dim=32, sample_steps=4, diffusion_x_sampling_steps=2, gradient_steps=100,
    )
    batch = pusht_ds.sample_batch(jax.random.PRNGKey(0), 8)
    pipe.train_step(batch)
    act = pipe.act(np.asarray(batch["obs"]["state"][:2, :2]))
    assert np.all(np.isfinite(np.asarray(act)))


def test_dp_image_pipeline():
    from cleandiffuser_tpu.dataset import PushTImageDataset
    from cleandiffuser_tpu.pipelines.dp_image import DPImagePipeline

    rb = generate_pusht_demos(n_episodes=2, max_steps=20, with_images=True,
                              image_size=96)
    ds = PushTImageDataset(rb, horizon=8, pad_before=1, pad_after=3)
    shape_meta = {
        "obs": {
            "image": {"shape": [3, 96, 96], "type": "rgb"},
            "agent_pos": {"shape": [2], "type": "low_dim"},
        }
    }
    pipe = DPImagePipeline(
        shape_meta=shape_meta, action_dim=2, horizon=8, obs_steps=2,
        action_steps=4, nn="chi_unet", diffusion="ddpm", sample_steps=2,
        emb_dim=64, crop_shape=(76, 76), gradient_steps=100,
    )
    batch = ds.sample_batch(jax.random.PRNGKey(0), 4)
    # adapt: dataset serves (B, L, C/H/W...) uint8 images + agent_pos
    obs = {"image": batch["obs"]["image"], "agent_pos": batch["obs"]["agent_pos"]}
    log = pipe.train_step({"obs": obs, "action": batch["action"]})
    assert np.isfinite(log["loss"])
    chunk = pipe.act_chunk(obs)
    assert chunk.shape == (4, 4, 2)

    # fully on-device visuomotor eval: render + encode + denoise + env
    # steps in one jitted rollout
    from cleandiffuser_tpu.env.pusht_jax import PushTImageEnvJax

    env = PushTImageEnvJax(render_size=96)
    mean_rew, mean_success = pipe.evaluate_on_device(
        env, ds.normalizer, num_envs=2, max_episode_steps=8)
    assert np.isfinite(mean_rew) and 0.0 <= mean_rew <= 1.0
    assert 0.0 <= mean_success <= 1.0
