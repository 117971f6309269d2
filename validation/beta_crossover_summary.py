"""Summarize the finite-T crossover sweep (round 4) into one table.

Reads validation/runs/beta_n6_z{05,10,20,40,80}_r4{,_polish}.jsonl and
prints last-300-iteration means ± sem for F, E, S vs S_analytical per Z,
plus the entropy self-consistency check.

    python validation/beta_crossover_summary.py [--json out.json]
"""

import argparse
import glob
import json
import os

import numpy as np

RUNS = "validation/runs"


def summarize(tag):
    rows = []
    for name in (f"beta_n6_{tag}_r4_polish.jsonl", f"beta_n6_{tag}_r4.jsonl"):
        path = os.path.join(RUNS, name)
        # Skip missing or empty (logger-initialized but unstarted) files.
        if os.path.exists(path) and os.path.getsize(path) > 0:
            rows = [json.loads(l) for l in open(path)]
            break
    if not rows:
        return None
    tail = rows[-300:]
    out = {"file": os.path.basename(path), "iters": rows[-1]["step"]}
    for k in ("F", "E", "S", "S_analytical", "accept_rate"):
        v = np.array([r[k] for r in tail], dtype=np.float64)
        out[k] = float(v.mean())
        out[k + "_sem"] = float(v.std(ddof=1) / np.sqrt(len(v)))
    out["F_std"] = float(np.mean([r["F_std"] for r in tail]))
    out["S_selfconsistency"] = abs(out["S"] - out["S_analytical"])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args()
    table = {}
    for z, tag in ((0.5, "z05"), (1.0, "z10"), (2.0, "z20"),
                   (4.0, "z40"), (8.0, "z80")):
        s = summarize(tag)
        if s:
            table[str(z)] = s
            print(
                f"Z={z:>3}: F={s['F']:.4f}±{s['F_sem']:.4f}  "
                f"E={s['E']:.4f}±{s['E_sem']:.4f}  "
                f"S={s['S']:.4f} vs S_ana={s['S_analytical']:.4f} "
                f"(|d|={s['S_selfconsistency']:.4f})  "
                f"accept={s['accept_rate']:.3f}  [{s['file']}]"
            )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(table, fh, indent=1)


if __name__ == "__main__":
    main()
