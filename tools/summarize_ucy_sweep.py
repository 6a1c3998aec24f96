"""Collate ucy_*.json sweep states into one operating-point table
(markdown to stdout; optionally refresh the sweep section of RESULTS_UCY.md
with --write)."""

import argparse
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rows():
    out = []
    for path in sorted(glob.glob(os.path.join(ROOT, "ucy_*.json"))):
        name = os.path.basename(path)[4:-5]
        try:
            with open(path) as f:
                d = json.load(f)
        except Exception:
            continue
        ft = d.get("finetune_test")
        if not ft:
            continue
        pre = d.get("pretrain_test", {})
        selected_pretrained = (
            abs(ft.get("mae", 0) - pre.get("mae", 1)) < 1e-9
            and ft.get("collision") == pre.get("collision")
        )
        out.append({
            "name": name,
            "mae": ft["mae"], "ot": ft["ot"], "mmd": ft["mmd"],
            "soft": ft["collision"], "hard": ft["hard_collision"],
            "val": d.get("finetune", {}).get("val_loss"),
            "epochs": d.get("finetune", {}).get("epochs_ran"),
            "sel_pre": selected_pretrained,
            "gt_soft": d.get("gt_test", {}).get("collision"),
            "gt_hard": d.get("gt_test", {}).get("hard_collision"),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    cli = ap.parse_args()
    rs = rows()
    lines = [
        "| run | MAE (m) | OT | soft | hard | ft epochs | selected |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rs:
        sel = "pretrained" if r["sel_pre"] else "finetuned"
        lines.append(
            f"| {r['name']} | {r['mae']:.4f} | {r['ot']:.4f} | "
            f"{r['soft']:.0f} | {r['hard']:.0f} | {r['epochs']} | {sel} |"
        )
    if rs and rs[0]["gt_soft"] is not None:
        lines.append(f"| *ground truth* | — | — | {rs[0]['gt_soft']:.0f} | "
                     f"{rs[0]['gt_hard']:.0f} | — | — |")
    table = "\n".join(lines)
    print(table)
    if cli.write:
        md = os.path.join(ROOT, "RESULTS_UCY.md")
        marker = "\n## Operating-point sweep (round 3)\n"
        with open(md) as f:
            txt = f.read()
        if marker in txt:
            # replace only this section: keep anything after the next
            # heading (or EOF) so later-added sections survive a rewrite
            start = txt.index(marker)
            rest = txt[start + len(marker):]
            nxt = rest.find("\n## ")
            tail = rest[nxt:] if nxt != -1 else ""
            txt = txt[:start]
        else:
            tail = ""
        with open(md, "w") as f:
            f.write(txt + marker + "\n" + table + "\n" + tail)
        print(f"\nupdated {md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
