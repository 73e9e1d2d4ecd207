"""Per-backbone config groups + hydra-style CLI flags (VERDICT r1 item 10).

The reference selects backbones via hydra config directories
(ref configs/dp/pusht/{dit,chi_unet,chi_transformer}/pusht*.yaml, dbc
{dit,pearce_mlp} groups, dp/dbc robomimic per-task yamls) driven by
`--config-path`/`--config-name`. These tests pin that the generated tree
covers every reference group file and that resolve_config_cli honors the
reference-documented flags verbatim.
"""

from pathlib import Path

import pytest

from cleandiffuser_tpu.utils.config import resolve_config_cli

ROOT = Path(__file__).resolve().parents[1]
CFG = ROOT / "configs"

# every per-backbone group file the reference ships (ref configs/)
REFERENCE_GROUP_FILES = [
    *[f"dp/pusht/{nn}/{v}.yaml"
      for nn in ("dit", "chi_unet", "chi_transformer")
      for v in ("pusht", "pusht_image", "pusht_keypoint")],
    *[f"dp/kitchen/{nn}/kitchen_abs.yaml"
      for nn in ("dit", "chi_unet", "chi_transformer")],
    *[f"dp/robomimic/{nn}/{t}_abs.yaml"
      for nn in ("dit", "chi_unet", "chi_transformer")
      for t in ("can", "lift", "square", "tool_hang", "transport")],
    *[f"dp/robomimic_multi_modal/{nn}/{t}_abs.yaml"
      for nn in ("dit", "chi_unet", "chi_transformer")
      for t in ("can", "lift", "square", "tool_hang", "transport")],
    *[f"dbc/pusht/{nn}/{v}.yaml"
      for nn in ("dit", "pearce_mlp")
      for v in ("pusht", "pusht_image", "pusht_keypoint")],
    *[f"dbc/kitchen/{nn}/kitchen.yaml" for nn in ("dit", "pearce_mlp")],
    *[f"dbc/robomimic/{nn}/{t}.yaml"
      for nn in ("dit", "pearce_mlp")
      for t in ("can", "lift", "square", "tool_hang", "transport")],
    *[f"dbc/robomimic_multi_modal/{nn}/{t}.yaml"
      for nn in ("dit", "pearce_mlp")
      for t in ("can", "lift", "square", "tool_hang", "transport")],
]


@pytest.mark.parametrize("rel", REFERENCE_GROUP_FILES)
def test_reference_group_file_exists(rel):
    assert (CFG / rel).exists(), f"missing group config {rel}"


def test_config_path_flag_selects_group():
    args = resolve_config_cli(
        CFG / "dp/pusht/chi_unet", "pusht",
        [f"--config-path={CFG}/dp/pusht/dit", "mode=inference"])
    assert args.nn == "dit"
    assert args.mode == "inference"


def test_config_name_flag_selects_variant():
    args = resolve_config_cli(
        CFG / "dp/pusht/chi_unet", "pusht", ["--config-name=pusht_keypoint"])
    assert args.env_name == "pusht-keypoints-v0"
    assert args.obs_dim == 20


def test_nn_shortcut_switches_sibling_group():
    args = resolve_config_cli(CFG / "dp/pusht/chi_unet", "pusht",
                              ["nn=chi_transformer"])
    assert args.nn == "chi_transformer"


def test_relative_config_path_resolves_against_script_dir(monkeypatch):
    # hydra resolves config_path relative to the decorated script; the
    # reference documents --config-path=../configs/... from pipelines/
    import sys

    monkeypatch.setattr(sys, "argv", [str(ROOT / "pipelines" / "dp_pusht.py")])
    args = resolve_config_cli(
        CFG / "dp/pusht/chi_unet", "pusht",
        ["--config-path=../configs/dbc/pusht/dit"])
    assert args.nn == "dit"
    assert args.pipeline_name == "dbc_pusht"


def test_dbc_group_dit_has_chunk_keys():
    args = resolve_config_cli(CFG / "dbc/pusht/dit", "pusht", [])
    assert args.nn == "dit"
    assert args.action_steps == 1
