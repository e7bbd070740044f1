"""Summarize a flagship-campaign results.jsonl into the paired
quality table (design.md §8 item 6).

Pairs ours-vs-reference per seed (byte-identical staged data), reports
best-dev / test-at-best-dev deltas, means with SEM, medians, and the
TAIL (worst seed, count below a threshold per framework) — the round-4
verdict's requirement that the tails be compared, not just the means.
Arms with no reference side (e.g. the attention arm) are compared
against ours-full_deprel on the same seeds.

    python tools/campaign_report.py --results \
        .campaign_r5/flagship/results.jsonl [--md]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np


def load(path):
    rows = [json.loads(line) for line in open(path)]
    by = defaultdict(dict)   # (tag, seed) -> framework -> row
    for r in rows:
        by[(r["tag"], r["seed"])][r["framework"]] = r
    return by


def arm_stats(pairs, key="best_dev_f1", thresh=0.55):
    # runs killed before their first logged dev epoch carry null metrics;
    # a partial campaign must still be analyzable, so drop those pairs
    pairs = [p for p in pairs
             if p[0].get(key) is not None and p[1].get(key) is not None]
    if not pairs:
        return {"n": 0}
    a = np.array([p[0][key] for p in pairs], float)
    b = np.array([p[1][key] for p in pairs], float)
    d = a - b
    return {
        "n": len(pairs),
        "ours_mean": float(a.mean()), "other_mean": float(b.mean()),
        "ours_median": float(np.median(a)),
        "other_median": float(np.median(b)),
        "delta_mean": float(d.mean()),
        "delta_sem": float(d.std(ddof=1) / np.sqrt(len(d)))
        if len(d) > 1 else 0.0,
        "delta_median": float(np.median(d)),
        "ours_worst": float(a.min()), "other_worst": float(b.min()),
        f"ours_below_{thresh}": int((a < thresh).sum()),
        f"other_below_{thresh}": int((b < thresh).sum()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--thresh", type=float, default=0.55)
    ap.add_argument("--md", action="store_true",
                    help="emit a markdown per-seed table too")
    args = ap.parse_args()
    by = load(args.results)

    # arm 1: ours full_deprel vs reference full_deprel (paired per seed)
    fd_pairs, att_pairs = [], []
    seeds = sorted({s for (t, s) in by if t == "full_deprel"})
    for s in seeds:
        row = by.get(("full_deprel", s), {})
        if "gcn_tpu" in row and "reference" in row:
            fd_pairs.append((row["gcn_tpu"], row["reference"]))
        arow = by.get(("attention", s), {})
        if "gcn_tpu" in arow and "gcn_tpu" in row:
            att_pairs.append((arow["gcn_tpu"], row["gcn_tpu"]))

    out = {"record": "campaign_report"}
    if fd_pairs:
        out["full_deprel_vs_reference"] = {
            "best_dev": arm_stats(fd_pairs, "best_dev_f1", args.thresh),
            "test_at_best_dev": arm_stats(
                [p for p in fd_pairs
                 if p[0]["test_f1_at_best_dev"] is not None
                 and p[1]["test_f1_at_best_dev"] is not None],
                "test_f1_at_best_dev", args.thresh),
        }
    if att_pairs:
        out["attention_vs_ours_full_deprel"] = {
            "best_dev": arm_stats(att_pairs, "best_dev_f1", args.thresh),
        }
    print(json.dumps(out, indent=1))

    if args.md:
        print("\n| seed | ours dev | ref dev | Δdev | ours test | ref test "
              "| ours ep (stop) | ref ep (stop) | attn dev |")
        print("|---|---|---|---|---|---|---|---|---|")
        for s in seeds:
            row = by.get(("full_deprel", s), {})
            o, r = row.get("gcn_tpu"), row.get("reference")
            at = by.get(("attention", s), {}).get("gcn_tpu")
            fmt = lambda v: "—" if v is None else f"{v:.3f}"  # noqa: E731
            if (o and r and o["best_dev_f1"] is not None
                    and r["best_dev_f1"] is not None):
                print(f"| {s} | {fmt(o['best_dev_f1'])} "
                      f"| {fmt(r['best_dev_f1'])} "
                      f"| {o['best_dev_f1'] - r['best_dev_f1']:+.3f} "
                      f"| {fmt(o['test_f1_at_best_dev'])} "
                      f"| {fmt(r['test_f1_at_best_dev'])} "
                      f"| {o['epochs_run']} | {r['epochs_run']} "
                      f"| {fmt(at['best_dev_f1']) if at else '—'} |")


if __name__ == "__main__":
    main()
