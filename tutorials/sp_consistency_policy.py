"""Tutorial: staged consistency policy (IQL -> EDM -> CD/CT -> inference).

(reference tutorials/sp_consistency_policy.py) Achieves 1-2 NFE action
sampling via consistency distillation of an EDM behavior policy, with
IQL-advantage candidate reselection.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoTDDataset, fake_d4rl_qlearning_dataset
from cleandiffuser_tpu.pipelines import ConsistencyPolicyPipeline

ds = D4RLMuJoCoTDDataset(fake_d4rl_qlearning_dataset(n_steps=3000, ep_len=200))
pipe = ConsistencyPolicyPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim,
                                 s0=6, s1=24, curriculum_cycle=200)
rng = jax.random.PRNGKey(0)

print("== stage 1: IQL ==")
for i in range(20):
    rng, k = jax.random.split(rng)
    log = pipe.iql_train_step(ds.sample_batch(k, 64))
print(log)

print("== stage 2: EDM behavior cloning ==")
for i in range(20):
    rng, k = jax.random.split(rng)
    log = pipe.edm_train_step(ds.sample_batch(k, 64))
print(log)

print("== stage 3: consistency distillation ==")
pipe.prepare_distillation(distillation_N=12)
for i in range(20):
    rng, k = jax.random.split(rng)
    log = pipe.cd_train_step(ds.sample_batch(k, 64))
print(log)

print("== inference: 2-NFE actions with IQL reselection ==")
obs = np.random.randn(4, ds.o_dim).astype(np.float32)
act = pipe.act(obs, model="cd", num_candidates=16, sampling_steps=2)
print("actions:", np.asarray(act))
