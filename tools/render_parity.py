"""Render the tier-1 score table in PARITY.md from results/scoreboard.json.

Keeps the measured-score docs mechanically in sync with the suite driver
(tools/run_score_suite.py): run after suite jobs land. The published bands
are approximate context ("where the original papers land on d4rl's own
datasets") — our datasets are REGENERATED with the d4rl recipe on
MuJoCo-v5 physics (see PARITY.md caveats), so bands are orientation, not
pass/fail targets.

Usage: python tools/render_parity.py
"""

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
BOARD = ROOT / "results/scoreboard.json"
PARITY = ROOT / "PARITY.md"

# (algorithm label, published band) per suite-job name. Bands quote the
# original papers' d4rl-v2 tables (DQL: Wang et al. 2023 Tab.1; IDQL:
# Hansen-Estruch et al. 2023; EDP: Kang et al. 2023; DD: Ajay et al. 2023;
# Diffuser: Janner et al. 2021) and the CleanDiffuser paper's re-runs
# (arXiv:2406.09509) where they differ.
ROWS = {
    "dql_hc_medium": ("DQL", "~0.47-0.52"),
    "idql_hc_medium": ("IDQL", "~0.48-0.51"),
    "edp_hc_medium": ("EDP", "~0.47-0.52"),
    "dql_hopper_medium": ("DQL", "~0.70-0.91"),
    "dql_walker2d_medium": ("DQL", "~0.82-0.87"),
    "idql_hopper_medium": ("IDQL", "~0.63-0.70"),
    "idql_walker2d_medium": ("IDQL", "~0.80-0.85"),
    "dql_hc_medexp": ("DQL", "~0.90-0.97"),
    "dql_hc_medreplay": ("DQL", "~0.45-0.48"),
    "dql_hopper_medreplay": ("DQL", "~0.93-1.02"),
    "dql_walker2d_medreplay": ("DQL", "~0.87-0.98"),
    "dql_hopper_medexp": ("DQL", "~0.95-1.11"),
    "dql_walker2d_medexp": ("DQL", "~1.05-1.10"),
    "dd_hc_medium": ("Decision Diffuser", "~0.44-0.49"),
    "diffuser_hc_medium": ("Diffuser", "~0.42-0.46"),
    "veteran_maze2d_umaze": ("Veteran", "n/a (maze2d; Diffuser ~1.14)"),
    "veteran_maze2d_umaze_gi": ("Veteran + goal inpaint", "Diffuser ~1.14"),
    "veteran_maze2d_medium": ("Veteran", "n/a (maze2d; Diffuser ~1.22)"),
    "veteran_maze2d_medium_gi": ("Veteran + goal inpaint", "Diffuser ~1.22"),
    "veteran_maze2d_large": ("Veteran", "n/a (maze2d; Diffuser ~1.23)"),
    "veteran_maze2d_large_gi": ("Veteran + goal inpaint", "Diffuser ~1.23"),
    "dql_antmaze_umaze": ("DQL", "~0.74-0.94"),
    "idql_antmaze_umaze": ("IDQL", "~0.57-0.94"),
    "dql_antmaze_umaze_div": ("DQL", "~0.55-0.66"),
    "dql_walker2d_medium_2m": ("DQL (2M steps)", "~0.82-0.87"),
    # family-coverage rows (one real-data row per remaining algorithm
    # family; bands from the original papers' hc-medium-v2 entries)
    "sfbc_hc_medium": ("SfBC", "~0.43-0.48"),
    "qgpo_hc_medium": ("QGPO", "~0.48-0.55"),
    "synther_hc_medium": ("SynthER + TD3BC", "~0.48-0.55"),
    "diffuserlite_hc_medium": ("DiffuserLite (R2 reflow)", "~0.44-0.48"),
    "adaptdiffuser_hc_medium": ("AdaptDiffuser", "~0.42-0.47"),
    # kitchen rows: read against the scripted-demonstrator ceiling
    # (PARITY.md caveats — behavior data means 1.89/4 per episode), not
    # only the human-demo bands quoted here
    "dd_kitchen_mixed": ("Decision Diffuser", "~0.50-0.65 (human demos)"),
    "dql_kitchen_mixed": ("DQL", "~0.55-0.65 (human demos)"),
    "dd_kitchen_mixed_tr068": ("Decision Diffuser (target 0.68)",
                               "~0.50-0.65 (human demos)"),
    "dd_kitchen_mixed_wcfg2": ("Decision Diffuser (w_cfg 2.0)",
                               "~0.50-0.65 (human demos)"),
    "veteran_maze2d_umaze_gi_pin5": ("Veteran + goal inpaint (pin 5)",
                                     "Diffuser ~1.14"),
    "veteran_maze2d_umaze_gi_pin9": ("Veteran + goal inpaint (pin 9)",
                                     "Diffuser ~1.14"),
    "veteran_maze2d_medium_gi_pin9": ("Veteran + goal inpaint (pin 9)",
                                      "Diffuser ~1.22"),
    "veteran_maze2d_medium_gi_pin15": ("Veteran + goal inpaint (pin 15)",
                                       "Diffuser ~1.22"),
    "veteran_maze2d_large_gi_pin15": ("Veteran + goal inpaint (pin 15)",
                                      "Diffuser ~1.23"),
}

BEGIN, END = "<!-- tier1:begin -->", "<!-- tier1:end -->"


def render(board: dict) -> str:
    lines = ["| Algorithm | Dataset | Steps | Score (this repo) | Published band |",
             "|---|---|---|---|---|"]

    def fmt_std(s):
        # sub-0.0005 stds are REAL on low-variance tasks (halfcheetah) —
        # "±0.000" reads as the pre-fix identical-seed bug, so show one
        # significant digit instead (±0.0002)
        return f"{s:.3f}" if s >= 0.0005 else f"{s:.1g}"

    for name, (algo, band) in ROWS.items():
        row = board.get(name)
        if not row or "error" in row:
            continue
        lines.append(
            f"| {algo} | {row['task']} | {row['steps']:,} | "
            f"**{row['score_mean']:.3f} ± {fmt_std(row['score_std'])}** | "
            f"{band} |")
    for name, row in board.items():
        if name not in ROWS and "error" not in row:
            lines.append(
                f"| {name} | {row['task']} | {row['steps']:,} | "
                f"**{row['score_mean']:.3f} ± {fmt_std(row['score_std'])}** "
                f"| — |")
    return "\n".join(lines)


def main():
    # r5 transition: merge the legacy r3-named board under the canonical
    # one (a pre-rename suite process may still append rows to the old
    # file); canonical rows win
    legacy = ROOT / "results/scoreboard_r3.json"
    board = json.loads(legacy.read_text()) if legacy.exists() else {}
    if BOARD.exists():
        board.update(json.loads(BOARD.read_text()))
    table = render(board)
    text = PARITY.read_text()
    if BEGIN not in text:
        raise SystemExit(f"PARITY.md lacks {BEGIN} marker")
    text = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END),
                  BEGIN + "\n" + table + "\n" + END, text, flags=re.S)
    PARITY.write_text(text)
    done = sum(1 for r in board.values() if "error" not in r)
    print(f"[parity] rendered {done} scored rows into PARITY.md")


if __name__ == "__main__":
    main()
