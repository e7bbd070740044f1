"""Large-forest benchmark: the BASELINE configs[4] workload on one chip.

A large synthetic dependency forest (tens of thousands of nodes; ~32-token
trees packed block-diagonally) is pushed through one regular-mode GCN
layer, fwd+bwd, under the three aggregation backends:

* ``dense``  — materialized [B,N,N] adjacency + banded matmuls: the
  reference's design (``model/gcn.py:269``) scaled up; HBM cost O(B·N²).
* ``pallas`` — ``ops.pallas.spmm_fused.fused_gcn_spmm``: adjacency built
  per-row inside VMEM, never in HBM; in-kernel one-hot build costs
  O(N²·E) MXU FLOPs, VMEM caps the row length near N≈512 (one-hot
  operands are [N,E] fp32; ~16 MB/core VMEM).
* ``edges``  — pure edge-list gather/scatter (``ops.spmm``), O(E·H)
  compute, no N² term anywhere.

The same forest is laid out at several row lengths N (B·N = total nodes,
identical edge set — the layout is free to choose), so the sweep answers
two different questions:

1. at FIXED layout, which backend wins — the Pallas-vs-XLA crossover the
   flagship (N=96) bench can't see;
2. which LAYOUT a large forest should use at all (the packed short-row
   layout amortizes everything; long rows are where dense dies).

``--probe`` additionally grows the dense path until allocation fails and
shows the edge-list path still running at that size (the no-[B,N,N]-HBM
memory headroom, measured not asserted).

Run on the chip:  python tools/large_forest_bench.py
CPU smoke:        python tools/large_forest_bench.py --tiny
One JSON record per (layout, backend) to stderr; a summary line with the
crossover verdict to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.utils.timing import calibrate, diag, scalar_chain_time

SENT = 32  # nodes per tree in the synthetic forest


def forest_rows(total_nodes: int, n: int, seed: int = 0):
    """Pack ``total_nodes // SENT`` random 32-node trees block-diagonally
    into [B, N] rows (B = total_nodes // n): edge lists + a node mask.
    Every layout carries the IDENTICAL forest, only row geometry differs."""
    assert n % SENT == 0 and total_nodes % n == 0
    b = total_nodes // n
    per_row = n // SENT
    rng = np.random.RandomState(seed)
    e_cap = n  # ≤ n-? edges per row: (SENT-1) * per_row < n
    parent = np.zeros((b, e_cap), np.int32)
    child = np.zeros((b, e_cap), np.int32)
    mask = np.zeros((b, e_cap), bool)
    for r in range(b):
        k = 0
        for s in range(per_row):
            off = s * SENT
            for t in range(1, SENT):
                parent[r, k] = off + rng.randint(t)
                child[r, k] = off + t
                mask[r, k] = True
                k += 1
    return (jnp.asarray(parent), jnp.asarray(child), jnp.asarray(mask))


def edges_layer(parent, child, mask, h, w, b):
    """Edge-list formulation of the fused layer math
    (``spmm_fused._ref_math`` semantics, O(E) aggregation)."""
    from gcn_tpu.ops.spmm import node_degrees, spmm_forward, spmm_reverse

    n = h.shape[1]
    deg_out, deg_in, incident = node_degrees(
        parent, child, mask, n, jnp.float32
    )
    denom = (deg_out + deg_in + incident.astype(jnp.float32) + 1.0)[..., None]
    ah = (spmm_forward(h, parent, child, mask)
          + spmm_reverse(h, parent, child, mask)
          + (incident.astype(h.dtype) + 1.0)[..., None] * h)
    z = jnp.matmul(ah, w) + 2.0 * b
    return jax.nn.relu(z.astype(jnp.float32) / denom).astype(h.dtype)


def dense_layer(parent, child, mask, h, w, b):
    from gcn_tpu.ops.pallas.spmm_fused import _ref_math

    return _ref_math(parent, child, mask, h, w, b)


def pallas_layer(parent, child, mask, h, w, b, interpret=None):
    from gcn_tpu.ops.pallas.spmm_fused import fused_gcn_spmm

    return fused_gcn_spmm(parent, child, mask, h, w, b, interpret)


def bench_backend(name, layer, parent, child, mask, h, w, b, edges,
                  tiny=False):
    """fwd+bwd slope time; returns seconds or None (compile/run failure —
    e.g. VMEM exhaustion for the block-dense kernel at long rows)."""
    def loss(hh, ww, bb, s):
        out = layer(parent, child, mask,
                    hh + (s * 1e-30).astype(hh.dtype), ww, bb)
        o = out.astype(jnp.float32)
        return jnp.sum(o * o)

    def step(s):
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(h, w, b, s)
        return l * 1e-30 + sum(jnp.sum(g.astype(jnp.float32)) * 1e-30
                               for g in grads)

    try:
        dt = scalar_chain_time(
            jax.jit(step), on_device=True,
            **({"k1": 1, "k2": 3, "repeats": 1} if tiny else {}),
        )
    except Exception as err:  # noqa: BLE001 — report, don't die
        diag(record="large_forest", backend=name, rows=int(h.shape[0]),
             row_len=int(h.shape[1]), failed=str(err)[:200])
        return None
    diag(record="large_forest", backend=name, rows=int(h.shape[0]),
         row_len=int(h.shape[1]), ms=round(dt * 1e3, 3),
         edges_per_sec=round(edges / dt, 1))
    return dt


def memory_probe(hidden, tiny=False):
    """Grow a LONG-row dense layout until allocation fails; confirm the
    edge-list path still runs at (and past) that size."""
    n = 512 if tiny else 4096
    results = {"row_len": n}
    for b in ([1, 2] if tiny else [16, 32, 64, 128, 256]):
        total = b * n
        parent, child, mask = forest_rows(total, n)
        key = jax.random.key(1)
        h = jax.random.normal(key, (b, n, hidden), jnp.bfloat16)
        w = jax.random.normal(key, (hidden, hidden), jnp.bfloat16) * 0.05
        bias = jnp.zeros((hidden,), jnp.bfloat16)

        def run(layer):
            def loss(hh):
                o = layer(parent, child, mask, hh, w, bias)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))(h)
            jax.block_until_ready(g)

        try:
            run(dense_layer)
            results[f"dense_B{b}"] = "ok"
        except Exception as err:  # noqa: BLE001
            results[f"dense_B{b}"] = "OOM:" + type(err).__name__
            diag(record="memory_probe", dense_failed_at_rows=b,
                 row_len=n, total_nodes=total, err=str(err)[:160])
            try:
                run(edges_layer)
                results[f"edges_B{b}"] = "ok"
                diag(record="memory_probe", edges_ok_at_rows=b, row_len=n,
                     total_nodes=total)
            except Exception as err2:  # noqa: BLE001
                results[f"edges_B{b}"] = "OOM:" + type(err2).__name__
            break
        run(edges_layer)
        results[f"edges_B{b}"] = "ok"
    return results




# --------------------------------------------------------------- attention
# The attention-mode backend crossover (VERDICT r4 item 7): the model's
# auto gate (models/gcn._ATTN_DENSE_BYTE_BUDGET) picks dense vs edge on
# the [B,N,N] f32 score-buffer footprint; this sweep MEASURES both
# backends over the same forest at several layouts so the budget is a
# measurement, not a guess.  Layer math mirrors models/gcn.py's
# attention branch exactly (dense: multiplicity-weighted masked softmax
# per band; edge: sddmm -> edge_softmax -> weighted SpMM per band).

def attn_dense_layer(parent, child, mask, h, wq, wk, w):
    import math

    from gcn_tpu.ops.adjacency import build_adjacency

    n = h.shape[1]
    q, k, hw = h @ wq, h @ wk, h @ w
    scale = 1.0 / math.sqrt(w.shape[1])
    adj = build_adjacency(parent, child, mask, n)
    s = (jnp.einsum("bxh,byh->bxy", q, k) * scale).astype(jnp.float32)
    cnt_f = adj.forward.astype(s.dtype)
    agg = None
    for cnt in (cnt_f, jnp.swapaxes(cnt_f, 1, 2)):
        m = cnt > 0
        sm = jnp.where(m, s, -1e30)
        mx = jax.lax.stop_gradient(jnp.max(sm, axis=2, keepdims=True))
        ex = jnp.where(m, cnt * jnp.exp(sm - mx), jnp.zeros((), s.dtype))
        den = jnp.maximum(ex.sum(axis=2, keepdims=True), 1e-30)
        a = (ex / den).astype(h.dtype)
        band = jnp.einsum("bxy,byh->bxh", a, hw)
        agg = band if agg is None else agg + band
    return jax.nn.relu((agg + hw).astype(jnp.float32)).astype(h.dtype)


def attn_edge_layer(parent, child, mask, h, wq, wk, w):
    import math

    from gcn_tpu.ops.pallas.sddmm import edge_softmax, sddmm
    from gcn_tpu.ops.spmm import spmm_forward, spmm_reverse

    n = h.shape[1]
    q, k, hw = h @ wq, h @ wk, h @ w
    scale = 1.0 / math.sqrt(w.shape[1])
    s_f = sddmm(parent, child, mask, q, k) * scale
    a_f = edge_softmax(parent, s_f, mask, n)
    agg = spmm_forward(hw, parent, child, mask, edge_weights=a_f)
    s_r = sddmm(child, parent, mask, q, k) * scale
    a_r = edge_softmax(child, s_r, mask, n)
    agg = agg + spmm_reverse(hw, parent, child, mask, edge_weights=a_r)
    return jax.nn.relu((agg + hw).astype(jnp.float32)).astype(h.dtype)


def bench_attn_backend(name, layer, parent, child, mask, h, wq, wk, w,
                       edges, tiny=False):
    def loss(hh, q_, k_, w_, s):
        out = layer(parent, child, mask,
                    hh + (s * 1e-30).astype(hh.dtype), q_, k_, w_)
        o = out.astype(jnp.float32)
        return jnp.sum(o * o)

    def step(s):
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            h, wq, wk, w, s)
        return l * 1e-30 + sum(jnp.sum(g.astype(jnp.float32)) * 1e-30
                               for g in grads)

    try:
        dt = scalar_chain_time(
            jax.jit(step), on_device=True,
            **({"k1": 1, "k2": 3, "repeats": 1} if tiny else {}),
        )
    except Exception as err:  # noqa: BLE001
        diag(record="large_forest_attn", backend=name,
             rows=int(h.shape[0]), row_len=int(h.shape[1]),
             score_buffer_mb=round(
                 h.shape[0] * h.shape[1] ** 2 * 4 / 2 ** 20, 1),
             failed=str(err)[:200])
        return None
    diag(record="large_forest_attn", backend=name, rows=int(h.shape[0]),
         row_len=int(h.shape[1]),
         score_buffer_mb=round(h.shape[0] * h.shape[1] ** 2 * 4 / 2 ** 20,
                               1),
         ms=round(dt * 1e3, 3), edges_per_sec=round(edges / dt, 1))
    return dt


def attention_sweep(args):
    calibrate(512 if args.tiny else 4096)
    hidden = args.hidden
    key = jax.random.key(0)
    best = {}
    for n in [int(x) for x in args.row_lens.split(",")]:
        parent, child, mask = forest_rows(args.total_nodes, n)
        b = args.total_nodes // n
        edges = int(np.asarray(mask).sum())
        h = jax.random.normal(key, (b, n, hidden), jnp.bfloat16)
        mkw = lambda kk: jax.random.normal(  # noqa: E731
            jax.random.key(kk), (hidden, hidden), jnp.bfloat16) * 0.05
        wq, wk, w = mkw(1), mkw(2), mkw(3)
        for name, layer in (("dense", attn_dense_layer),
                            ("edge", attn_edge_layer)):
            dt = bench_attn_backend(name, layer, parent, child, mask,
                                    h, wq, wk, w, edges, tiny=args.tiny)
            if dt:
                best[(n, b, name)] = edges / dt
    summary = {
        "metric": "attention_backend_crossover",
        "total_nodes": args.total_nodes, "hidden": hidden,
        "results": {f"N{n}_B{b}_{k}": round(v, 1)
                    for (n, b, k), v in best.items()},
    }
    dense_wins_mb = []
    for (n, b, k) in sorted(best):
        if k != "dense":
            continue
        e = best.get((n, b, "edge"))
        mb = b * n * n * 4 / 2 ** 20
        summary[f"dense_vs_edge_N{n}"] = (
            round(best[(n, b, "dense")] / e, 2) if e else None)
        if e and best[(n, b, "dense")] >= e:
            dense_wins_mb.append(mb)
    if dense_wins_mb:
        summary["dense_wins_up_to_score_buffer_mb"] = max(dense_wins_mb)
    print(json.dumps(summary))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--total_nodes", type=int, default=65536)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--row_lens", type=str, default="128,512,1024,2048")
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke: small shapes, interpret-mode pallas")
    p.add_argument("--probe", action="store_true",
                   help="also run the dense-OOM memory probe")
    p.add_argument("--attention", action="store_true",
                   help="sweep the attention dense/edge backends instead "
                        "of the aggregation backends")
    args = p.parse_args()
    if args.tiny:
        args.total_nodes = 512
        args.row_lens = "64,128"
        args.hidden = 32
    if args.attention:
        attention_sweep(args)
        return

    calibrate(512 if args.tiny else 4096)
    hidden = args.hidden
    key = jax.random.key(0)
    best = {}
    for n in [int(x) for x in args.row_lens.split(",")]:
        parent, child, mask = forest_rows(args.total_nodes, n)
        b = args.total_nodes // n
        edges = int(np.asarray(mask).sum())
        h = jax.random.normal(key, (b, n, hidden), jnp.bfloat16)
        w = jax.random.normal(key, (hidden, hidden), jnp.bfloat16) * 0.05
        bias = jnp.zeros((hidden,), jnp.bfloat16)
        for name, layer in (
            ("dense", dense_layer),
            ("pallas", pallas_layer),
            ("edges", edges_layer),
        ):
            dt = bench_backend(name, layer, parent, child, mask,
                               h, w, bias, edges, tiny=args.tiny)
            if dt:
                best[(n, name)] = edges / dt

    summary = {
        "metric": "large_forest_edges_per_sec",
        "total_nodes": args.total_nodes,
        "hidden": hidden,
        "results": {f"N{n}_{k}": round(v, 1) for (n, k), v in best.items()},
    }
    if best:
        (n_star, k_star), v_star = max(best.items(), key=lambda kv: kv[1])
        summary["best"] = {"row_len": n_star, "backend": k_star,
                           "edges_per_sec": round(v_star, 1)}
        # the crossover verdict: does any pallas row beat dense at the
        # same layout, and which layout wins overall
        for n in sorted({n for (n, _) in best}):
            d, pl_ = best.get((n, "dense")), best.get((n, "pallas"))
            if d and pl_:
                summary[f"pallas_vs_dense_N{n}"] = round(pl_ / d, 2)
    if args.probe:
        summary["memory_probe"] = memory_probe(hidden, args.tiny)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
