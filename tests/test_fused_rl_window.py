"""Fused RL train window (runner.make_rl_train_scan) equivalence tests.

The fused window compiles `n_steps x (device gather + actor/critic
update)` into one `lax.scan` program; it must advance the pipeline state
exactly like `n_steps` sequential `pipe.train_step(dataset.sample_batch())`
calls fed the same key sequence.
"""

import jax
import numpy as np
import pytest

from cleandiffuser_tpu.dataset import D4RLMuJoCoTDDataset
from cleandiffuser_tpu.dataset.fake import fake_d4rl_qlearning_dataset
from cleandiffuser_tpu.pipelines.runner import make_rl_train_scan, rl_window_fn


def _dataset():
    return D4RLMuJoCoTDDataset(
        fake_d4rl_qlearning_dataset("halfcheetah-medium-v2", n_steps=256)
    )


def _assert_states_close(tree_a, tree_b):
    for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                    jax.tree_util.tree_leaves(tree_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("family", ["dql", "edp", "idql"])
def test_window_matches_sequential_steps(family):
    ds = _dataset()
    kwargs = dict(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=2,
                  gradient_steps=100, rng=0)
    if family == "dql":
        from cleandiffuser_tpu.pipelines import DQLPipeline as P
        kwargs["sampling_steps"] = 2
    elif family == "edp":
        from cleandiffuser_tpu.pipelines.edp import EDPPipeline as P
    else:
        from cleandiffuser_tpu.pipelines.idql import IDQLPipeline as P

    n_steps, batch = 4, 8
    root = jax.random.PRNGKey(7)

    pipe_seq = P(**kwargs)
    for k in jax.random.split(root, n_steps):
        pipe_seq.train_step(ds.sample_batch(k, batch))

    pipe_win = P(**kwargs)
    log = make_rl_train_scan(pipe_win, ds, batch, n_steps)(root)
    assert all(np.isfinite(np.asarray(v)) for v in log.values())

    _assert_states_close(pipe_seq.actor.state.params, pipe_win.actor.state.params)
    _assert_states_close(pipe_seq.actor.state.ema_params,
                         pipe_win.actor.state.ema_params)
    _assert_states_close(pipe_seq.critic_state, pipe_win.critic_state)
    assert int(pipe_win.actor.state.step) == n_steps


@pytest.mark.parametrize("family", ["diffuser", "dd"])
def test_planner_window_matches_sequential(family):
    """Planner fused windows: the diffusion engine state must match the
    sequential path bitwise-ish (same gather keys, same internal rng); the
    secondary stage (classifier / invdyn) uses its own rng stream, so only
    finiteness + step advancement are asserted for it."""
    from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset

    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=288, ep_len=48)
    ds = D4RLMuJoCoDataset(raw, horizon=8)
    if family == "diffuser":
        from cleandiffuser_tpu.pipelines import DiffuserPipeline
        mk = lambda: DiffuserPipeline(
            obs_dim=ds.o_dim, act_dim=ds.a_dim, horizon=8, model_dim=16,
            dim_mult=(1, 2), diffusion_steps=4, sampling_steps=4,
            diffusion_gradient_steps=100, classifier_gradient_steps=2, rng=0)
    else:
        from cleandiffuser_tpu.pipelines import DDPipeline
        mk = lambda: DDPipeline(
            obs_dim=ds.o_dim, act_dim=ds.a_dim, horizon=8, emb_dim=16,
            d_model=32, n_heads=2, depth=1, diffusion_gradient_steps=100,
            invdyn_gradient_steps=2, sampling_steps=4, rng=0)

    n_steps, batch = 4, 8
    root = jax.random.PRNGKey(3)

    pipe_seq = mk()
    for k in jax.random.split(root, n_steps):
        pipe_seq.train_step(ds.sample_batch(k, batch))

    pipe_win = mk()
    log = pipe_win.make_train_scan(ds, batch, n_steps)(root)
    assert all(np.isfinite(np.asarray(v)) for v in log.values())

    _assert_states_close(pipe_seq.agent.state.params, pipe_win.agent.state.params)
    _assert_states_close(pipe_seq.agent.state.ema_params,
                         pipe_win.agent.state.ema_params)
    assert int(pipe_win.agent.state.step) == n_steps
    # secondary stage advanced exactly to its 2-step budget
    if family == "diffuser":
        assert int(pipe_win.classifier.state.step) == 2


@pytest.mark.parametrize("guidance,pipeline_type", [
    ("MCSS", "separate"), ("cfg", "joint"), ("cg", "joint")])
def test_veteran_window_matches_sequential(guidance, pipeline_type):
    """Veteran planner-stage fused window vs sequential train_step across
    the guidance x pipeline grid (planner state must match; secondary
    stages use their own rng streams -> finiteness + step counts only)."""
    from cleandiffuser_tpu.dataset import DV_D4RLMuJoCoSeqDataset
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset
    from cleandiffuser_tpu.pipelines.veteran import VeteranPipeline

    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=288, ep_len=48)
    ds = DV_D4RLMuJoCoSeqDataset(raw, horizon=8, stride=1)

    def mk():
        return VeteranPipeline(
            obs_dim=ds.o_dim, act_dim=ds.a_dim, planner_horizon=8,
            guidance_type=guidance, pipeline_type=pipeline_type,
            planner_net="transformer", planner_emb_dim=16, planner_d_model=32,
            planner_depth=1, policy_hidden_dim=32, policy_diffusion_steps=2,
            gradient_steps=100, planner_sampling_steps=2,
            policy_sampling_steps=2, rng=0)

    n_steps, batch = 3, 8
    root = jax.random.PRNGKey(13)

    pipe_seq = mk()
    for k in jax.random.split(root, n_steps):
        k1, k2 = jax.random.split(k)
        pipe_seq.train_step(ds.sample_batch(k1, batch),
                            ds.sample_batch(k2, batch))

    pipe_win = mk()
    log = pipe_win.make_train_scan(ds, batch, n_steps)(root)
    assert all(np.isfinite(np.asarray(v)) for v in log.values()), log

    _assert_states_close(pipe_seq.planner.state.params,
                         pipe_win.planner.state.params)
    assert int(pipe_win.planner.state.step) == n_steps
    if guidance == "MCSS":
        _assert_states_close(pipe_seq.critic_params, pipe_win.critic_params)
    if pipeline_type == "separate":
        assert int(pipe_win.policy.state.step) == n_steps


def test_veteran_ev_window_matches_sequential():
    from cleandiffuser_tpu.dataset import DV_D4RLMuJoCoSeqDataset
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset
    from cleandiffuser_tpu.pipelines.veteran import VeteranPipeline

    td = _dataset()

    def mk():
        return VeteranPipeline(
            obs_dim=td.o_dim, act_dim=td.a_dim, planner_horizon=8,
            planner_emb_dim=16, planner_d_model=32, planner_depth=1,
            policy_hidden_dim=32, policy_diffusion_steps=2,
            gradient_steps=100, rng=0)

    n_steps, batch = 3, 8
    root = jax.random.PRNGKey(17)
    pipe_seq = mk()
    for k in jax.random.split(root, n_steps):
        pipe_seq.train_expected_value_step(td.sample_batch(k, batch))
    pipe_win = mk()
    log = pipe_win.make_ev_train_scan(td, batch, n_steps)(root)
    assert np.isfinite(np.asarray(log["loss_v"]))
    _assert_states_close(pipe_seq.ev_state, pipe_win.ev_state)


def test_synther_windows_match_sequential():
    from cleandiffuser_tpu.pipelines.synther import SynthERPipeline, TD3BC

    ds = _dataset()
    n_steps, batch = 3, 8
    root = jax.random.PRNGKey(11)

    seq = SynthERPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=4,
                          hidden_dim=32, n_blocks=1, gradient_steps=100, rng=0)
    for k in jax.random.split(root, n_steps):
        seq.train_step(ds.sample_batch(k, batch))
    win = SynthERPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=4,
                          hidden_dim=32, n_blocks=1, gradient_steps=100, rng=0)
    log = win.make_train_scan(ds, batch, n_steps)(root)
    assert np.isfinite(np.asarray(log["loss"]))
    _assert_states_close(seq.diffusion.state.params, win.diffusion.state.params)

    seq_a = TD3BC(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=100, rng=0)
    for k in jax.random.split(root, n_steps):
        seq_a.update(ds.sample_batch(k, batch))
    win_a = TD3BC(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=100, rng=0)
    log = win_a.make_train_scan(ds, batch, n_steps)(root)
    assert all(np.isfinite(np.asarray(v)) for v in log.values())
    _assert_states_close(seq_a.state.actor_params, win_a.state.actor_params)
    _assert_states_close(seq_a.state.critic_params, win_a.state.critic_params)


def test_diffuserlite_window_matches_sequential():
    from cleandiffuser_tpu.dataset import MultiHorizonD4RLMuJoCoDataset
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset
    from cleandiffuser_tpu.pipelines.diffuserlite import DiffuserLitePipeline

    from cleandiffuser_tpu.pipelines import compute_temporal_horizons

    planning = (5, 9)
    temporal = compute_temporal_horizons(planning)  # [33, 9]
    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=400, ep_len=100)
    ds = MultiHorizonD4RLMuJoCoDataset(raw, horizons=temporal)

    def mk():
        return DiffuserLitePipeline(
            obs_dim=ds.o_dim, act_dim=ds.a_dim, planning_horizons=planning,
            emb_dim=16, d_model=32, n_heads=2, depth=1,
            diffusion_gradient_steps=100, rng=0)

    n_steps, batch = 3, 8
    root = jax.random.PRNGKey(29)

    seq = mk()
    for i, k in enumerate(jax.random.split(root, n_steps)):
        seq.train_step([ds.sample_batch(k, batch, horizon_idx=j)
                        for j in range(2)], i < 2)

    win = mk()
    log = win.make_train_scan(ds, batch, n_steps, invdyn_budget=2)(root)
    assert all(np.isfinite(np.asarray(v)) for v in log.values()), log

    for a, b in zip(seq.diffusions, win.diffusions):
        _assert_states_close(a.state.params, b.state.params)
        assert int(b.state.step) == n_steps


def test_sfbc_bc_window_matches_sequential():
    from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset
    from cleandiffuser_tpu.pipelines.sfbc import SfBCPipeline

    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=288, ep_len=48)
    ds = D4RLMuJoCoDataset(raw, horizon=4)
    n_steps, batch = 3, 4
    root = jax.random.PRNGKey(19)

    def mk():
        return SfBCPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, emb_dim=16,
                            hidden_dim=32, rng=0)

    seq = mk()
    for k in jax.random.split(root, n_steps):
        seq.bc_train_step(ds.sample_batch(k, batch))
    win = mk()
    log = win.make_bc_train_scan(ds, batch, n_steps)(root)
    assert np.isfinite(np.asarray(log["loss"]))
    _assert_states_close(seq.actor.state.params, win.actor.state.params)


def test_qgpo_windows_match_sequential():
    from cleandiffuser_tpu.pipelines.qgpo import QGPOPipeline

    ds = _dataset()
    n_steps, batch = 3, 8
    root = jax.random.PRNGKey(23)

    def mk():
        return QGPOPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, emb_dim=16,
                            K=4, rng=0)

    rng_np = np.random.default_rng(0)
    sup = rng_np.standard_normal((ds.size, 4, ds.a_dim)).astype(np.float32)

    # q stage: fused vs sequential with identical index keys
    seq, win = mk(), mk()
    for k in jax.random.split(root, n_steps):
        idx = np.asarray(jax.random.randint(k, (batch,), 0, ds.size))
        seq.q_train_step({
            "obs": {"state": ds.obs[idx]},
            "next_obs": {"state": ds.next_obs[idx]},
            "act": ds.act[idx], "rew": ds.rew[idx], "tml": ds.tml[idx],
            "supported_act": sup[idx],
        })
    log = win.make_q_train_scan(ds, sup, batch, n_steps)(root)
    assert np.isfinite(np.asarray(log["q_loss"]))
    _assert_states_close(seq.q_params, win.q_params)
    _assert_states_close(seq.q_target_params, win.q_target_params)

    # cep stage: its own rng stream for add_noise -> finiteness + steps
    log = win.make_cep_train_scan(ds, sup, batch, n_steps)(root)
    assert all(np.isfinite(np.asarray(v)) for v in log.values())
    assert int(win.classifier.state.step) == n_steps


def test_rl_window_fn_alignment_gates():
    ds = _dataset()
    from cleandiffuser_tpu.pipelines import DQLPipeline

    pipe = DQLPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=2,
                       sampling_steps=2, gradient_steps=100, rng=0)

    class A:
        batch_size = 8
        log_interval = 10
        save_interval = 25  # NOT a multiple of log_interval
        gradient_steps = 100

    assert rl_window_fn(pipe, ds, A(), mesh=None) is None
    A.save_interval = 50
    assert rl_window_fn(pipe, ds, A(), mesh=None) is not None
    assert rl_window_fn(pipe, ds, A(), mesh=object()) is None


def test_train_loop_realigns_misaligned_resume():
    """A resume step off the window grid must realign with per-step
    updates and then use the fused window — NOT silently run the whole
    schedule per-step (a stale ckpt_latest once cost 15x wall clock)."""
    from cleandiffuser_tpu.pipelines.runner import train_loop

    calls = {"step": 0, "window": 0}

    def step_fn(k):
        calls["step"] += 1
        return {"loss": jax.numpy.zeros(())}

    def window_fn(k):
        calls["window"] += 1
        return {"loss": jax.numpy.zeros(())}

    train_loop(step_fn, gradient_steps=40, log_interval=10, save_interval=40,
               save_fn=lambda tag: None, resume_fn=lambda: 7,
               window_fn=window_fn)
    assert calls["step"] == 3   # realign 7 -> 10
    assert calls["window"] == 3  # 10 -> 40 in three windows
