"""Edges/sec scaling-efficiency harness (north-star metric, BASELINE.md).

Runs the sharded data-parallel train step at increasing device counts on
the available platform and reports throughput + scaling efficiency vs the
single-device run (global batch scales with the mesh, weak scaling).

On real multi-chip hardware this measures ICI scaling; on a single-host CPU
(``--cpu --devices 1,2,4,8`` with the virtual-device flag set by this
script) it validates the harness itself — virtual devices share one
machine, so efficiency there is not a hardware claim.

    python tools/scaling_bench.py --cpu --devices 1,2,4,8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8",
                   help="comma-separated device counts to sweep")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch_per_device", type=int, default=16)
    p.add_argument("--seq_len", type=int, default=96)
    p.add_argument("--seconds", type=float, default=2.0)
    args = p.parse_args()

    counts = [int(x) for x in args.devices.split(",")]
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(counts)}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as g
    from gcn_tpu.models.gcn import GCNClassifier
    from gcn_tpu.parallel.mesh import make_mesh
    from gcn_tpu.parallel.train_step import make_sharded_train_step
    from gcn_tpu.train.optim import build_optimizer

    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]
    print(f"platform={jax.default_backend()} devices={avail} "
          f"sweep={counts}")

    results = []
    for ndev in counts:
        cfg = g._flagship_cfg(tiny=args.cpu)
        b = args.batch_per_device * ndev
        n = args.seq_len if not args.cpu else 32
        batch = g._synthetic_batch(cfg, b=b, n=n)
        edges = int(batch["edge_mask"].sum())
        mesh = make_mesh(data=ndev, model=1,
                         devices=jax.devices()[:ndev])
        model = GCNClassifier(cfg.model)
        params = jax.jit(lambda r, bb: model.init(r, bb, True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch,
        )
        tx = build_optimizer("sgd", 0.3)
        opt_state = tx.init(params)
        step, p_, o_, _ = make_sharded_train_step(
            model, tx, cfg, mesh, params, opt_state, batch
        )
        key = jax.random.key(1)
        for _ in range(3):
            p_, o_, loss = step(p_, o_, batch, key)
        jax.block_until_ready(loss)
        iters = 0
        t0 = time.time()
        while time.time() - t0 < args.seconds:
            p_, o_, loss = step(p_, o_, batch, key)
            iters += 1
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / iters
        eps = edges / dt
        results.append((ndev, eps))
        base = results[0][1] * ndev / results[0][0]
        print(json.dumps({
            "devices": ndev,
            "edges_per_sec": round(eps, 1),
            "per_device": round(eps / ndev, 1),
            "efficiency_vs_1dev": round(eps / base, 3),
        }))


if __name__ == "__main__":
    main()
