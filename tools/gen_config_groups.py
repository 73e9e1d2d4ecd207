"""Generate the reference's per-backbone config groups (VERDICT r1 item 10).

The reference selects NN backbones via hydra config *directories*
(ref configs/dp/pusht/{dit,chi_unet,chi_transformer}/pusht{,_image,_keypoint}.yaml,
ref configs/dbc/{pusht,kitchen,robomimic,robomimic_multi_modal}/{dit,pearce_mlp}/...,
ref configs/dp/{kitchen,robomimic,robomimic_multi_modal}/<nn>/<task>_abs.yaml),
driven by `--config-path`/`--config-name` CLI flags. This script materializes
the same tree from our flat per-benchmark configs (which stay as the CLI
defaults), so every reference-documented invocation resolves verbatim via
utils/config.resolve_config_cli.

Each generated file is self-contained: flat base + task-group merge +
the group's nn/abs_action/env_name deltas. Idempotent; run from repo root:
    python tools/gen_config_groups.py
"""

from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]
CFG = ROOT / "configs"

ROBOMIMIC_TASKS = ["can", "lift", "square", "tool_hang", "transport"]


def load(p):
    with open(p) as f:
        return yaml.safe_load(f) or {}


def dump(p, d):
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)


def merged(base_path, task=None, **deltas):
    d = load(base_path)
    d.pop("defaults", None)
    if task is not None:
        d.update(load(base_path.parent / "task" / f"{task}.yaml"))
    d.update(deltas)
    return d


def main():
    n = 0

    # ---- dp/pusht/<nn>/{pusht,pusht_keypoint,pusht_image}.yaml ----
    for nn in ["dit", "chi_unet", "chi_transformer"]:
        g = CFG / "dp" / "pusht" / nn
        base = load(g / "pusht.yaml")  # groups already exist for pusht.yaml
        kp = dict(base)
        kp.update(env_name="pusht-keypoints-v0", obs_dim=20,
                  obs_keys=["state", "action", "keypoint"],
                  pipeline_name="dp_pusht_keypoint_" + nn,
                  dataset_path="dev/pusht/pusht_demos_keypoint.npz")
        dump(g / "pusht_keypoint.yaml", kp)
        img = merged(CFG / "dp" / "pusht_image" / "pusht_image.yaml", nn=nn)
        if nn == "chi_unet":
            img["horizon"] = 16  # ChiUNet needs 2^n (ref chi_unet yamls)
        dump(g / "pusht_image.yaml", img)
        n += 2

    # ---- dp/kitchen/<nn>/{kitchen,kitchen_abs}.yaml ----
    for nn in ["dit", "chi_unet", "chi_transformer"]:
        g = CFG / "dp" / "kitchen" / nn
        dump(g / "kitchen.yaml",
             merged(CFG / "dp" / "kitchen" / "kitchen.yaml", nn=nn))
        dump(g / "kitchen_abs.yaml",
             merged(CFG / "dp" / "kitchen" / "kitchen.yaml", nn=nn,
                    abs_action=True))
        n += 2

    # ---- dp/robomimic/<nn>/<task>_abs.yaml (reference ships abs only) ----
    for nn in ["dit", "chi_unet", "chi_transformer"]:
        for t in ROBOMIMIC_TASKS:
            dump(CFG / "dp" / "robomimic" / nn / f"{t}_abs.yaml",
                 merged(CFG / "dp" / "robomimic" / "robomimic.yaml", task=t,
                        nn=nn, abs_action=True))
            n += 1

    # ---- dp/robomimic_multi_modal/<nn>/<task>_abs.yaml (image DP) ----
    for nn in ["dit", "chi_unet", "chi_transformer"]:
        for t in ROBOMIMIC_TASKS:
            dump(CFG / "dp" / "robomimic_multi_modal" / nn / f"{t}_abs.yaml",
                 merged(CFG / "dp" / "robomimic_image" / "robomimic_image.yaml",
                        task=t, nn=nn, abs_action=True))
            n += 1

    # ---- dbc/pusht/<nn>/{pusht,pusht_keypoint,pusht_image}.yaml ----
    flat = CFG / "dbc" / "pusht" / "pusht.yaml"
    base_src = flat if flat.exists() else CFG / "dbc" / "pusht" / "pearce_mlp" / "pusht.yaml"
    base = load(base_src)
    for nn in ["dit", "pearce_mlp"]:
        g = CFG / "dbc" / "pusht" / nn
        d = dict(base)
        d.update(nn=nn)
        if nn == "dit":
            d.update(action_steps=1)  # dit = chunk diffusion (ref: 1)
        dump(g / "pusht.yaml", d)
        kp = dict(d)
        kp.update(env_name="pusht-keypoints-v0", obs_dim=20,
                  obs_keys=["state", "action", "keypoint"],
                  dataset_path="dev/pusht/pusht_demos_keypoint.npz")
        dump(g / "pusht_keypoint.yaml", kp)
        img = merged(CFG / "dbc" / "pusht_image" / "pusht_image.yaml", nn=nn)
        dump(g / "pusht_image.yaml", img)
        n += 3
    if flat.exists():
        flat.unlink()  # superseded by the groups (CLI default -> pearce_mlp/)

    # ---- dbc/kitchen/<nn>/kitchen.yaml ----
    for nn in ["dit", "pearce_mlp"]:
        dump(CFG / "dbc" / "kitchen" / nn / "kitchen.yaml",
             merged(CFG / "dbc" / "kitchen" / "kitchen.yaml", nn=nn))
        n += 1

    # ---- dbc/robomimic{,_multi_modal}/<nn>/<task>.yaml ----
    for nn in ["dit", "pearce_mlp"]:
        for t in ROBOMIMIC_TASKS:
            dump(CFG / "dbc" / "robomimic" / nn / f"{t}.yaml",
                 merged(CFG / "dbc" / "robomimic" / "robomimic.yaml", task=t,
                        nn=nn))
            dump(CFG / "dbc" / "robomimic_multi_modal" / nn / f"{t}.yaml",
                 merged(CFG / "dbc" / "robomimic_image" / "robomimic_image.yaml",
                        task=t, nn=nn))
            n += 2

    print(f"wrote {n} group configs under {CFG}")


if __name__ == "__main__":
    main()
