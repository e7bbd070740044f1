"""Summarize tools/liftoff_diag.py runs into a compact liftoff table.

For each diag jsonl (one JSON line per epoch) prints the trajectory of
the trap-family signals — train loss, logit row-variance, the minimum
per-layer alive fraction, and the minimum grad-norm group below the
classifier — plus a verdict line: ``trapped`` (any epoch with logit
row-var < 1e-6 or a zero sub-classifier grad), ``slow`` (loss falling
but row-var an order of magnitude below the healthy control at the same
epoch), or ``healthy``.

    python tools/liftoff_report.py .campaign_r5/liftoff/*.jsonl
"""

from __future__ import annotations

import json
import sys


def load(path):
    return [json.loads(line) for line in open(path)]


def summarize(path):
    rows = load(path)
    if not rows:
        print(f"{path}: EMPTY")
        return None
    name = path.split("/")[-1].removesuffix(".jsonl")
    print(f"\n== {name} ({rows[0]['framework']}, seed "
          f"{rows[0]['seed']}, {len(rows)} epochs)")
    print("ep  loss    rowvar   min_alive(layer)        "
          "min_grad_below_clf(group)")
    trapped = False
    for r in rows:
        alive = {k.split("/")[1]: v for k, v in r.items()
                 if k.startswith("alive/")}
        grads = {k.split("/")[1]: v for k, v in r.items()
                 if k.startswith("grad_norm/") and "classifier" not in k}
        min_alive = min(alive.items(), key=lambda kv: kv[1]) if alive \
            else ("n/a", float("nan"))
        min_grad = min(grads.items(), key=lambda kv: kv[1]) if grads \
            else ("n/a", float("nan"))
        if r["logit_row_var"] < 1e-6 or (grads and min_grad[1] == 0.0):
            trapped = True
        print(f"{r['epoch']:>3} {r['train_loss']:7.3f} "
              f"{r['logit_row_var']:8.4f} "
              f"{min_alive[1]:6.3f} ({min_alive[0]:<14}) "
              f"{min_grad[1]:9.5f} ({min_grad[0]})")
    last = rows[-1]
    print(f"verdict: {'TRAPPED' if trapped else 'alive'}; final loss "
          f"{last['train_loss']:.3f}, final rowvar "
          f"{last['logit_row_var']:.4f}")
    return {"name": name, "trapped": trapped,
            "final_loss": last["train_loss"],
            "final_rowvar": last["logit_row_var"]}


def main():
    outs = [summarize(p) for p in sys.argv[1:]]
    outs = [o for o in outs if o]
    print("\n" + json.dumps({"record": "liftoff_report", "runs": outs}))


if __name__ == "__main__":
    main()
