"""One-step VP-SDE solver updates, shared by discrete & continuous engines.

Re-derivation of the 8-solver zoo of the reference
(cleandiffuser/diffusion/diffusionsde.py:15-18, 543-589): ddpm, ddim,
dpm-solver-1 (ODE), dpm-solver++-1 / ++-2M (ODE), and their SDE variants.
The solver is chosen by a *static* Python string so the branch disappears at
trace time — inside the compiled scan there is exactly one fused elementwise
update over the trajectory tensor.

All per-step scalars are gathered from precomputed (steps+1,) tables with
dynamic index `i` (the scan carries `i`); `i-1` indexes the next (less noisy)
level. `noise` is a fresh standard normal of x's shape; `is_first` marks the
first scan iteration (used by the 2M multistep correction), `prev_x_theta`
is the previous step's data prediction.
"""

from __future__ import annotations

import jax.numpy as jnp

SUPPORTED_SOLVERS = [
    "ddpm",
    "ddim",
    "ode_dpmsolver_1",
    "ode_dpmsolver++_1",
    "ode_dpmsolver++_2M",
    "sde_dpmsolver_1",
    "sde_dpmsolver++_1",
    "sde_dpmsolver++_2M",
]

__all__ = ["SUPPORTED_SOLVERS", "solver_step", "epstheta_to_xtheta", "xtheta_to_epstheta"]


def epstheta_to_xtheta(x, alpha, sigma, eps_theta):
    """x_theta = (x - sigma * eps_theta) / alpha."""
    return (x - sigma * eps_theta) / alpha


def xtheta_to_epstheta(x, alpha, sigma, x_theta):
    """eps_theta = (x - alpha * x_theta) / sigma."""
    return (x - alpha * x_theta) / sigma


def solver_step(
    solver: str,
    xt,
    eps_theta,
    x_theta,
    prev_x_theta,
    is_first,
    i,
    alphas,
    sigmas,
    hs,
    stds,
    noise,
):
    """Advance x from noise level i to level i-1. Returns new x."""
    a_i, a_p = alphas[i], alphas[i - 1]
    s_i, s_p = sigmas[i], sigmas[i - 1]
    h_i = hs[i]
    std_i = stds[i]

    if solver == "ddpm":
        x = (a_p / a_i) * (xt - s_i * eps_theta) + jnp.sqrt(
            jnp.maximum(s_p**2 - std_i**2, 0.0) + 1e-8
        ) * eps_theta
        # noise only added when not stepping onto the final level (i > 1)
        x = x + jnp.where(i > 1, std_i, 0.0) * noise

    elif solver == "ddim":
        x = a_p * ((xt - s_i * eps_theta) / a_i) + s_p * eps_theta

    elif solver == "ode_dpmsolver_1":
        x = (a_p / a_i) * xt - s_p * jnp.expm1(h_i) * eps_theta

    elif solver == "ode_dpmsolver++_1":
        x = (s_p / s_i) * xt - a_p * jnp.expm1(-h_i) * x_theta

    elif solver == "ode_dpmsolver++_2M":
        # multistep correction uses previous data prediction
        r = hs[jnp.minimum(i + 1, hs.shape[0] - 1)] / h_i
        D = (1 + 0.5 / r) * x_theta - (0.5 / r) * prev_x_theta
        D = jnp.where(is_first, x_theta, D)
        x = (s_p / s_i) * xt - a_p * jnp.expm1(-h_i) * D

    elif solver == "sde_dpmsolver_1":
        x = (
            (a_p / a_i) * xt
            - 2 * s_p * jnp.expm1(h_i) * eps_theta
            + s_p * jnp.sqrt(jnp.maximum(jnp.expm1(2 * h_i), 0.0)) * noise
        )

    elif solver == "sde_dpmsolver++_1":
        x = (
            (s_p / s_i) * jnp.exp(-h_i) * xt
            - a_p * jnp.expm1(-2 * h_i) * x_theta
            + s_p * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h_i), 0.0)) * noise
        )

    elif solver == "sde_dpmsolver++_2M":
        r = hs[jnp.minimum(i + 1, hs.shape[0] - 1)] / h_i
        D = (1 + 0.5 / r) * x_theta - (0.5 / r) * prev_x_theta
        D = jnp.where(is_first, x_theta, D)
        x = (
            (s_p / s_i) * jnp.exp(-h_i) * xt
            - a_p * jnp.expm1(-2 * h_i) * D
            + s_p * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h_i), 0.0)) * noise
        )

    else:
        raise ValueError(f"Solver {solver} is not supported.")

    return x
