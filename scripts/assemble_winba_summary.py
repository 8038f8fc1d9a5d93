"""Assemble the round-5 window-BA summary table from block-4 outputs.

Reads artifacts/campaign_r8/{winba,nowin}_*_ate.json (written by
scripts/r5par/block4.sh) and writes
artifacts/campaign_r8/window_ba_summary_r5.json: per checkpoint
(campaign_r8 base vs campaign_r9 window-finetuned) x sequence
(easy seq_r8 / hard hard_r8) x mode (single / multi / none), the ATE
RMSE and the percent change vs the same checkpoint's no-window run —
the VERDICT r4 item-3 decision table ("does training through the
window solve make window BA earn its keep?").
"""

import json
import os
import sys

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "campaign_r8")


def main():
    out = {}
    for tag in ("campaign_r8", "campaign_r9"):
        for base in ("seq_r8", "hard_r8"):
            key = f"{tag}/{base}"
            row = {}
            nw = os.path.join(ART, f"nowin_{tag}_{base}_ate.json")
            if not os.path.exists(nw):
                continue
            row["no_window"] = json.load(open(nw))["ate_rmse"]
            for mode in ("single", "multi"):
                p = os.path.join(ART,
                                 f"winba_{tag}_{base}_{mode}_ate.json")
                if os.path.exists(p):
                    ate = json.load(open(p))["ate_rmse"]
                    row[mode] = ate
                    row[f"{mode}_vs_nowin_pct"] = round(
                        100.0 * (ate - row["no_window"])
                        / row["no_window"], 2)
            out[key] = {k: (round(v, 5) if isinstance(v, float) else v)
                        for k, v in row.items()}
    dst = os.path.join(ART, "window_ba_summary_r5.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
