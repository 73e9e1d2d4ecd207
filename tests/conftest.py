"""Test configuration: run hermetically on a virtual 8-device CPU mesh.

jax is pre-imported at interpreter startup in this environment (axon TPU
integration), so env vars alone are too late — use jax.config.update.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Test tiers. The default tier (pyproject addopts: -m 'not slow') must stay
# around ~37 min wall on this 1-core host with -n 6; the functions below are
# the measured heavy tail (>=180s call time in logs/pytest_durations_r4.log,
# dominated by pipeline training loops and fused-window equivalence scans)
# and are auto-marked `slow`. Run them with `-m slow` (the score-suite /
# round-end checklist does); `-m 'slow or not slow'` runs everything.
# Explicit @pytest.mark.slow decorations elsewhere still apply on top.
SLOW_TEST_FUNCTIONS = {
    "test_adaptdiffuser",
    "test_cm_training_and_sample",
    "test_consistency_policy_stages",
    "test_dbc",
    "test_dbc_dit_chunk",
    "test_dd_train_and_plan",
    "test_diffuser_train_and_plan",
    "test_diffuserlite",
    "test_diffuserlite_window_matches_sequential",
    "test_dp_edm",
    "test_dp_image_pipeline",
    "test_dp_on_device_eval",
    "test_dp_pipeline_trains_on_mesh",
    "test_dp_pusht_window_on_mesh_matches_single_device",
    "test_dp_train_and_chunk",
    "test_dql_pipeline_dp_matches_single_device",
    "test_dql_save_load",
    "test_dql_train_and_act",
    "test_edp",
    "test_engine_nested_classifier_placed_on_mesh",
    "test_fsdp_matches_single_device_and_shards_opt_state",
    "test_fused_window_on_mesh_matches_single_device",
    "test_idql",
    "test_jannerunet",
    "test_planner_window_matches_sequential",
    "test_qgpo",
    "test_qgpo_windows_match_sequential",
    "test_resnet18_image_condition",
    "test_sfbc",
    "test_sfbc_bc_window_matches_sequential",
    "test_synther_and_td3bc",
    "test_veteran",
    "test_veteran_goal_inpaint_pins_final_xy",
    "test_veteran_gi_pin_idx_pins_midplan",
    "test_veteran_window_matches_sequential",
    "test_window_matches_sequential_steps",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    slow = pytest.mark.slow
    for item in items:
        name = getattr(item, "originalname", None) or item.name.split("[")[0]
        if name in SLOW_TEST_FUNCTIONS:
            item.add_marker(slow)
