"""Hermetic score-parity benchmark (VERDICT r1 item 4).

d4rl is not installable here, so algorithm quality is asserted against the
Goal2D task (env/goal2d.py) whose optimal return is ANALYTIC: normalized
score 1.0 = closed-form optimum, 0.0 = uniform-random policy. The mixture
behavior data scores ~0.49, so any algorithm beating ~0.6 is provably
stitching/filtering beyond behavior cloning, and the RL policies must
reach >=85% of the true optimum. These thresholds were measured at ~0.92
(DQL), ~0.91 (IDQL), ~0.92 (EDP 6k steps), ~0.73 (Diffuser, myopic
horizon 8 of a 40-step task) on the CPU backend with the seeds below;
failures indicate a real algorithm regression, not noise.
"""

import jax
import numpy as np
import pytest

# Every test here trains at least one policy to a learning threshold —
# minutes each, the bulk of the suite's wall clock. Slow tier: excluded
# from the default `pytest tests/` run (pyproject addopts), executed by
# the score-suite chain via `pytest tests/ -m slow`.
pytestmark = pytest.mark.slow

from cleandiffuser_tpu.dataset.d4rl_mujoco import (
    D4RLMuJoCoDataset,
    D4RLMuJoCoTDDataset,
)
from cleandiffuser_tpu.dataset.hermetic import (
    goal2d_qlearning_dataset,
    goal2d_sequence_dataset,
)
from cleandiffuser_tpu.env.goal2d import (
    evaluate_policy,
    normalized_score_fn,
    optimal_return,
)


@pytest.fixture(scope="module")
def score():
    return normalized_score_fn()


@pytest.fixture(scope="module")
def td_dataset():
    return D4RLMuJoCoTDDataset(goal2d_qlearning_dataset(n_episodes=1000, seed=0))


def _train(pipe, dataset, steps, batch):
    rng = jax.random.PRNGKey(0)
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        pipe.train_step(dataset.sample_batch(k, batch))


def _policy_score(pipe, norm, score, n_cand, num_envs=128, **act_kw):
    def act_fn(k, obs):
        return pipe.act(np.asarray(norm.normalize(obs)),
                        num_candidates=n_cand, rng=k, **act_kw)

    return score(evaluate_policy(act_fn, num_envs=num_envs, seed=1))


def test_analytic_anchors(score):
    # sanity: optimal policy == 1.0 by construction, behavior data ~0.49
    s0 = jax.random.uniform(jax.random.PRNGKey(1), (128, 2), minval=-1, maxval=1)
    assert float(optimal_return(s0).mean()) < 0.0
    data = goal2d_qlearning_dataset(n_episodes=500, seed=3)
    behavior = score(float(data["rewards"].sum()) / 500)
    assert 0.35 < behavior < 0.65


def test_optimal_return_is_achievable_and_tight():
    """The closed form must equal a brute-force greedy rollout exactly —
    with BOX actions the optimum saturates both axes (diagonal speed
    sqrt(2)*DT), strictly beating straight-line-at-speed-DT motion
    (regression: the old closed form used the ball-speed bound and sat
    below the true optimum, so policies could score > 1.0)."""
    import jax.numpy as jnp
    import numpy as np

    from cleandiffuser_tpu.env.goal2d import DT, HORIZON, Goal2DEnv, Goal2DState

    env = Goal2DEnv()
    s0 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (64, 2)).astype(np.float32))
    state, total = Goal2DState(s0), jnp.zeros(64)
    for _ in range(HORIZON):
        a = jnp.clip(-state.pos / DT, -1, 1)  # greedy per-step norm min
        state, _, rew, _ = env.step(state, a)
        total = total + rew
    np.testing.assert_allclose(np.asarray(total), np.asarray(optimal_return(s0)),
                               atol=1e-5)
    # diagonal start: box optimum strictly beats the ball-speed bound
    diag = jnp.asarray([[1.0, 1.0]])
    d0 = float(jnp.linalg.norm(diag))
    ball_bound = -sum(max(d0 - t * DT, 0.0) for t in range(1, HORIZON + 1))
    assert float(optimal_return(diag)[0]) > ball_bound + 1e-3


def test_dql_reaches_near_optimum(td_dataset, score):
    from cleandiffuser_tpu.pipelines.dql import DQLPipeline

    pipe = DQLPipeline(obs_dim=2, act_dim=2, emb_dim=32, hidden_dim=128,
                       gradient_steps=3000, discount=0.95, eta=1.0, rng=0)
    _train(pipe, td_dataset, 3000, 128)
    s = _policy_score(pipe, td_dataset.get_normalizer(), score, 50)
    assert s >= 0.85, f"DQL normalized score {s:.3f} < 0.85"


def test_idql_reaches_near_optimum(td_dataset, score):
    from cleandiffuser_tpu.pipelines.idql import IDQLPipeline

    pipe = IDQLPipeline(obs_dim=2, act_dim=2, emb_dim=32, actor_hidden_dim=128,
                        critic_hidden_dim=128, actor_n_blocks=2,
                        gradient_steps=3000, discount=0.95, iql_tau=0.7, rng=0)
    _train(pipe, td_dataset, 3000, 128)
    s = _policy_score(pipe, td_dataset.get_normalizer(), score, 64)
    assert s >= 0.85, f"IDQL normalized score {s:.3f} < 0.85"


def test_edp_reaches_near_optimum(td_dataset, score):
    from cleandiffuser_tpu.pipelines.edp import EDPPipeline

    pipe = EDPPipeline(obs_dim=2, act_dim=2, emb_dim=32, hidden_dim=128,
                       gradient_steps=6000, discount=0.95, eta=1.0, rng=0)
    _train(pipe, td_dataset, 6000, 128)
    s = _policy_score(pipe, td_dataset.get_normalizer(), score, 50)
    assert s >= 0.85, f"EDP normalized score {s:.3f} < 0.85"


def test_dd_cfg_target_return_near_optimum(score):
    """Decision Diffuser: CFG on the scaled MC return must steer plans to
    near-optimal returns (measured 0.96 at this budget — return
    conditioning sees past the myopic horizon that caps CG-Diffuser at
    ~0.73 on this task)."""
    from cleandiffuser_tpu.pipelines.dd import DDPipeline

    ds = D4RLMuJoCoDataset(goal2d_sequence_dataset(n_episodes=1000, seed=0),
                           terminal_penalty=0.0, horizon=8,
                           max_path_length=40, discount=0.99)
    GS = 3000
    pipe = DDPipeline(obs_dim=2, act_dim=2, horizon=8, emb_dim=64,
                      d_model=128, n_heads=4, depth=2, return_scale=40.0,
                      val_shift=1.0, sampling_steps=10, w_cfg=1.2,
                      target_return=1.0, temperature=0.5,
                      diffusion_gradient_steps=GS, invdyn_gradient_steps=GS,
                      rng=0)
    _train(pipe, ds, GS, 64)
    norm = ds.get_normalizer()

    def act_fn(k, obs):
        a, _ = pipe.act(np.asarray(norm.normalize(obs)), rng=k)
        return a

    s = score(evaluate_policy(act_fn, num_envs=64, seed=1))
    assert s >= 0.85, f"DD normalized score {s:.3f} < 0.85"


def test_consistency_policy_distillation_near_optimum(td_dataset, score):
    """Staged chain IQL -> EDM -> consistency distillation: the 2-NFE
    distilled student must stay near the 5-NFE EDM teacher's quality
    (measured 0.96 teacher / 0.90 student at this budget; direct
    consistency TRAINING needs a much longer curriculum and is only
    smoke-checked elsewhere)."""
    from cleandiffuser_tpu.pipelines.consistency_policy import (
        ConsistencyPolicyPipeline,
    )

    pipe = ConsistencyPolicyPipeline(obs_dim=2, act_dim=2, emb_dim=32,
                                     hidden_dim=128, curriculum_cycle=2000,
                                     s0=10, s1=160, rng=0)
    rng = jax.random.PRNGKey(0)
    for _ in range(2000):
        rng, k = jax.random.split(rng)
        pipe.iql_train_step(td_dataset.sample_batch(k, 128))
    for _ in range(3000):
        rng, k = jax.random.split(rng)
        pipe.edm_train_step(td_dataset.sample_batch(k, 128))
    norm = td_dataset.get_normalizer()

    def act_edm(k, obs):
        return pipe.act(np.asarray(norm.normalize(obs)), model="edm",
                        num_candidates=32, sampling_steps=5, rng=k)

    s_teacher = score(evaluate_policy(act_edm, num_envs=128, seed=1))
    assert s_teacher >= 0.85, f"EDM teacher score {s_teacher:.3f} < 0.85"

    pipe.prepare_distillation(distillation_N=18)
    for _ in range(2000):
        rng, k = jax.random.split(rng)
        pipe.cd_train_step(td_dataset.sample_batch(k, 128))

    def act_cd(k, obs):
        return pipe.act(np.asarray(norm.normalize(obs)), model="cd",
                        num_candidates=32, sampling_steps=2, rng=k)

    s_student = score(evaluate_policy(act_cd, num_envs=128, seed=1))
    assert s_student >= 0.80, (
        f"2-NFE distilled score {s_student:.3f} < 0.80 (teacher {s_teacher:.3f})")


def test_diffuser_beats_behavior(score):
    from cleandiffuser_tpu.pipelines.diffuser import DiffuserPipeline

    ds = D4RLMuJoCoDataset(goal2d_sequence_dataset(n_episodes=1000, seed=0),
                           terminal_penalty=0.0, horizon=8,
                           max_path_length=40, discount=0.99)
    GS = 2500
    pipe = DiffuserPipeline(obs_dim=2, act_dim=2, horizon=8, model_dim=32,
                            dim_mult=(1, 2), diffusion_steps=20,
                            sampling_steps=10, terminal_penalty=0.0,
                            discount=0.99, diffusion_gradient_steps=GS,
                            classifier_gradient_steps=GS, w_cg=5.0, rng=0)
    _train(pipe, ds, GS, 64)
    norm = ds.get_normalizer()

    def act_fn(k, obs):
        act, _ = pipe.act(np.asarray(norm.normalize(obs)),
                          num_candidates=16, rng=k)
        return act

    s = score(evaluate_policy(act_fn, num_envs=32, seed=1))
    # guided planning with a horizon covering only 8 of 40 steps is myopic;
    # the bar is beating the 0.49 behavior data by a clear margin
    # (measured ~0.73 at this budget)
    assert s >= 0.60, f"Diffuser normalized score {s:.3f} < 0.60"
