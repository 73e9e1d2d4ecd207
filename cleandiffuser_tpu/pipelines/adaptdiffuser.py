"""AdaptDiffuser pipeline (TPU-native).

Re-design of reference pipelines/adaptdiffuser_d4rl_mujoco.py:114-167:
Diffuser plus a self-evolving fine-tune stage — generate trajectories from
dataset start-states, keep those whose classifier value exceeds a metric
threshold, then fine-tune the diffusion model on the kept set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .diffuser import DiffuserPipeline

__all__ = ["AdaptDiffuserPipeline"]


class AdaptDiffuserPipeline(DiffuserPipeline):
    """Diffuser + `generate_and_filter` / fine-tune stages."""

    def generate_and_filter(
        self,
        start_obs: np.ndarray,
        metric_value: float,
        sampling_steps: Optional[int] = None,
        rng: Optional[jax.Array] = None,
    ):
        """Sample trajectories from start states; return those with
        classifier log-p above `metric_value` (reference :128-147)."""
        E = start_obs.shape[0]
        key = ("gen", E)
        if key not in self._plan_fn_cache:
            sample_fn = self.agent.build_sample_fn(
                solver=self.solver,
                sample_steps=sampling_steps or self.sampling_steps,
                cfg_mode="uncond",
                use_cg=True,
                final_logp=True,
            )

            def gen(params, cls_params, r, obs):
                prior = jnp.zeros((E, self.horizon, self.obs_dim + self.act_dim))
                prior = prior.at[:, 0, : self.obs_dim].set(obs)
                traj, log = sample_fn(
                    params, cls_params, r, prior,
                    w_cg=self.w_cg, temperature=self.temperature,
                )
                return traj, log["log_p"]

            self._plan_fn_cache[key] = jax.jit(gen)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        traj, logp = self._plan_fn_cache[key](
            self.agent.state.ema_params, self.classifier.inference_params, rng,
            jnp.asarray(start_obs),
        )
        traj, logp = np.asarray(traj), np.asarray(logp)
        keep = logp[:, 0] > metric_value
        return traj[keep], logp[keep]

    def finetune_step(self, traj_batch):
        """Fine-tune the diffusion on selected synthetic trajectories."""
        return self.agent.update(jnp.asarray(traj_batch))
