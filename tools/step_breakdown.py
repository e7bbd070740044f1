"""Per-stage step-time breakdown of the flagship C-GCN training step.

Times ablated variants of the identical flagship workload (B=50, N=96
synthetic TACRED forest) with the honest slope-chained harness and derives
where the milliseconds go:

* ``full``          — flagship fp32 XLA path (bench.py headline config)
* ``fwd_only``      — forward pass alone (bwd+optimizer = full - fwd)
* ``no_rnn``        — BiLSTM removed (RNN fwd+bwd cost = full - no_rnn)
* ``gcn_1layer``    — one GCN layer instead of two (per-layer cost)
* ``regular_adj``   — regular aggregation instead of full_deprel
                      (deprel-bilinear cost)
* ``bf16``          — compute_dtype=bfloat16
* ``pallas``        — use_pallas=True
* ``rnn_unroll4``   — BiLSTM scan unrolled 4x

Run on the real chip:  python tools/step_breakdown.py
CPU smoke:             python tools/step_breakdown.py --tiny
Batch scaling:         python tools/step_breakdown.py --batches 50,100,200
One JSON line per variant to stdout + a final derived-breakdown record.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import __graft_entry__ as g
import bench
from gcn_tpu.utils.rng import configure_prng
from gcn_tpu.utils.timing import calibrate, scalar_chain_time, step_flops

configure_prng("auto")  # the product default (TrainConfig.prng_impl)


def bench_forward(cfg, batch, label):
    """Forward(train-mode)-only counterpart of bench.bench_train_step."""
    from gcn_tpu.models.gcn import GCNClassifier
    from gcn_tpu.parallel.train_step import make_loss_fn

    model = GCNClassifier(cfg.model)
    params = jax.jit(lambda r, bb: model.init(r, bb, True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch
    )
    jax.block_until_ready(params)
    loss_fn = make_loss_fn(model, cfg)
    key = jax.random.key(2)

    @jax.jit
    def step(s):
        p = jax.tree.map(
            lambda a: a + (s * 1e-30).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )
        return loss_fn(p, batch, key).astype(jnp.float32)

    k = (2, 4) if "--tiny" in sys.argv else (10, 30)
    dt = scalar_chain_time(step, *k)
    flops = step_flops(step, jnp.float32(0.0))
    return dt, flops


def batch_sweep(batches):
    """Single-chip throughput vs batch size (bf16, flagship config), XLA
    vs Pallas aggregation.  The XLA full_deprel einsum materializes an
    [B·N, D·T] intermediate that scales with batch (645 MB at B=200) and
    becomes HBM-bound; the Pallas kernels never build it, so this sweep
    locates the crossover batch for the use_pallas default."""
    calibrate()
    for b in batches:
        for label, use_pallas in (("xla", False), ("pallas", True)):
            cfg = g._flagship_cfg()
            cfg.model.compute_dtype = "bfloat16"
            cfg.model.use_pallas = use_pallas
            batch = g._synthetic_batch(cfg, b=b, n=96)
            try:
                dt, edges, flops = bench.bench_train_step(
                    cfg, batch, f"b{b}_{label}")
            except Exception as e:  # e.g. OOM on the XLA intermediate
                print(json.dumps({
                    "variant": f"batch_{b}_{label}", "batch": b,
                    "path": label, "failed": type(e).__name__,
                    "detail": str(e).splitlines()[0][:160],
                }), flush=True)
                continue
            rec = {"variant": f"batch_{b}_{label}", "batch": b,
                   "path": label,
                   "ms_per_step": round(dt * 1e3, 3),
                   "edges_per_sec": round(edges / dt, 1)}
            if flops:
                rec["cost_analysis_flops"] = flops
            print(json.dumps(rec), flush=True)


def main():
    if "--batches" in sys.argv:
        arg = sys.argv[sys.argv.index("--batches") + 1]
        batch_sweep([int(x) for x in arg.split(",")])
        return

    tiny = "--tiny" in sys.argv
    if not tiny:
        calibrate()
    b, n = (8, 32) if tiny else (50, 96)

    def cfg_with(**kw):
        cfg = g._flagship_cfg(tiny=tiny)
        for k, v in kw.items():
            setattr(cfg.model, k, v)
        return cfg

    variants = {
        "full": cfg_with(),
        "no_rnn": cfg_with(rnn=False),
        "gcn_1layer": cfg_with(num_layers=1),
        "regular_adj": cfg_with(adj_type="regular"),
        "bf16": cfg_with(compute_dtype="bfloat16"),
        "pallas": cfg_with(use_pallas=True),
        "rnn_unroll4": cfg_with(rnn_unroll=4),
    }

    times = {}
    for label, cfg in variants.items():
        batch = g._synthetic_batch(cfg, b=b, n=n)
        dt, edges, flops = bench.bench_train_step(cfg, batch, label)
        times[label] = dt * 1e3
        rec = {"variant": label, "ms_per_step": round(dt * 1e3, 3),
               "edges_per_sec": round(edges / dt, 1)}
        if flops:
            rec["cost_analysis_flops"] = flops
        print(json.dumps(rec), flush=True)

    cfg = variants["full"]
    batch = g._synthetic_batch(cfg, b=b, n=n)
    dt_f, flops_f = bench_forward(cfg, batch, "fwd_only")
    times["fwd_only"] = dt_f * 1e3
    print(json.dumps({"variant": "fwd_only",
                      "ms_per_step": round(dt_f * 1e3, 3),
                      "cost_analysis_flops": flops_f}), flush=True)

    full = times["full"]
    breakdown = {
        "record": "derived_breakdown_ms",
        "full": round(full, 3),
        "forward": round(times["fwd_only"], 3),
        "backward_plus_optimizer": round(full - times["fwd_only"], 3),
        "bilstm_fwd_bwd": round(full - times["no_rnn"], 3),
        "gcn_layer_fwd_bwd_each": round(full - times["gcn_1layer"], 3),
        "deprel_bilinear_fwd_bwd": round(full - times["regular_adj"], 3),
        "bf16_speedup": round(full / times["bf16"], 3),
        "pallas_speedup": round(full / times["pallas"], 3),
        "rnn_unroll4_speedup": round(full / times["rnn_unroll4"], 3),
    }
    print(json.dumps(breakdown), flush=True)


if __name__ == "__main__":
    main()
