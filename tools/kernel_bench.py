"""Per-kernel microbenchmarks: Pallas vs XLA formulation, fwd and fwd+bwd.

Covers each custom Pallas TPU kernel against its pure-XLA oracle on
flagship-shaped inputs (B=50 sentences, N=96 tokens, ~one tree edge per
token — the ``train_cgcn.sh`` workload shapes):

* ``fused_gcn_spmm``   — whole regular-mode GCN layer from COO edge lists
* ``fused_band_aggregate`` — (A_f x_f + A_fT x_r + x_s)/denom (+relu)
* ``sddmm``            — per-edge attention scores u[parent]·v[child]
* ``deprel_bilinear``  — Σ_d e_d (x @ W_d), v1 (d-loop) and v2
  (relation-major) variants, vs the XLA einsum
* ``bilstm``           — persistent Pallas LSTM scan vs the fused
  two-direction ``lax.scan`` (rolled and unroll-8)

Timing uses the repo-wide honest methodology (``gcn_tpu.utils.timing``):
scalar-chained iterations + slope between two chain lengths, with a bf16
matmul calibration printed first.  Each case reports ms/iter, dependency
edges/s (where edges are meaningful), and TFLOP/s from XLA cost_analysis.

Run on the real chip:   python tools/kernel_bench.py
CPU smoke (interpret):  python tools/kernel_bench.py --tiny
Prints one JSON line per case to stdout.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.utils.timing import (
    calibrate,
    chip_peak,
    scalar_chain_time,
    step_flops,
)


def _sq(out):
    """Loss with a data-dependent cotangent: grad of plain ``sum`` is a
    constant ones tensor that lets XLA algebraically collapse the backward
    matmuls (ones @ Wᵀ → row-sum) — opaque Pallas VJPs can't, so ``sum``
    would bias the comparison.  ``sum(out²)`` keeps backward honest."""
    o = out.astype(jnp.float32)
    return jnp.sum(o * o)


def make_edges(b, n, seed=0):
    """Random trees: parent/child/mask [B,E] with E=N edge slots."""
    rng = np.random.RandomState(seed)
    lengths = rng.randint(max(2, n // 2), n + 1, b).astype(np.int32)
    parent = np.zeros((b, n), np.int32)
    child = np.zeros((b, n), np.int32)
    mask = np.zeros((b, n), bool)
    for i in range(b):
        li = int(lengths[i])
        for t in range(1, li):
            parent[i, t - 1] = rng.randint(t)
            child[i, t - 1] = t
            mask[i, t - 1] = True
    return jnp.asarray(parent), jnp.asarray(child), jnp.asarray(mask)


def report(name, path, mode, dt, edges, flops):
    rec = {
        "kernel": name,
        "path": path,
        "mode": mode,
        "ms": round(dt * 1e3, 4),
    }
    if dt <= 2e-6 or (flops and flops / dt > 1.05 * chip_peak()):
        # slope lost in noise, or implies more than the chip's peak
        rec["timing_reliable"] = False
    if edges:
        rec["edges_per_sec"] = round(edges / dt, 1)
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 2)
        rec["mfu"] = round(flops / dt / chip_peak(), 4)
    print(json.dumps(rec), flush=True)
    return rec


def time_case(name, path, make_scalar_fn, grad_args, k=(20, 140)):
    """Time fwd and fwd+bwd of ``make_scalar_fn(*arrays) -> f32 scalar``.

    ``grad_args``: (arrays tuple, argnums to differentiate).  The timing
    step injects the scalar carry into the first differentiable array with
    a +s*1e-30 nudge, which creates the cross-iteration dependency without
    perturbing values.
    """
    arrays, argnums = grad_args
    first = argnums[0]

    def with_nudge(s):
        a = list(arrays)
        a[first] = a[first] + (s * 1e-30).astype(a[first].dtype)
        return a

    @jax.jit
    def fwd_step(s):
        return make_scalar_fn(*with_nudge(s))

    gfn = jax.grad(make_scalar_fn, argnums=argnums)

    @jax.jit
    def grad_step(s):
        gs = gfn(*with_nudge(s))
        return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

    out = []
    for mode, step in (("fwd", fwd_step), ("fwd+bwd", grad_step)):
        dt = scalar_chain_time(step, *k, repeats=4, on_device=True)
        flops = step_flops(step, jnp.float32(0.0))
        out.append((mode, dt, flops))
    return out


def main():
    tiny = "--tiny" in sys.argv
    if not tiny:
        calibrate()
    b, n = (4, 16) if tiny else (50, 96)
    t_dim, h_dim, d_dim = (16, 16, 10) if tiny else (200, 200, 42)
    key = jax.random.key(0)
    parent, child, mask = make_edges(b, n)
    edges = int(np.asarray(mask).sum())
    k1, k2 = (2, 4) if tiny else (50, 250)

    h = jax.random.normal(key, (b, n, t_dim), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (t_dim, h_dim),
                          jnp.float32) * 0.05
    bias = jnp.zeros((h_dim,), jnp.float32)

    # --- fused_gcn_spmm: whole regular GCN layer ------------------------
    from gcn_tpu.ops.pallas.spmm_fused import _ref_math, fused_gcn_spmm

    cases = {
        "pallas": lambda hh, ww, bb: _sq(
            fused_gcn_spmm(parent, child, mask, hh, ww, bb)),
        "xla": lambda hh, ww, bb: _sq(
            _ref_math(parent, child, mask, hh, ww, bb)),
    }
    for path, fn in cases.items():
        for mode, dt, flops in time_case(
                "fused_gcn_spmm", path, fn, ((h, w, bias), (0, 1, 2)),
                (k1, k2)):
            report("fused_gcn_spmm", path, mode, dt, edges, flops)

    # --- fused_band_aggregate -------------------------------------------
    from gcn_tpu.ops.pallas.band_aggregate import (
        band_ref_math,
        fused_band_aggregate,
    )

    x_f = jax.random.normal(jax.random.key(2), (b, n, h_dim), jnp.float32)
    x_r = jax.random.normal(jax.random.key(3), (b, n, h_dim), jnp.float32)
    x_s = jax.random.normal(jax.random.key(4), (b, n, h_dim), jnp.float32)
    cases = {
        "pallas": lambda a1, a2, a3: _sq(
            fused_band_aggregate(parent, child, mask, a1, a2, a3)),
        "xla": lambda a1, a2, a3: _sq(
            band_ref_math(parent, child, mask, a1, a2, a3)),
    }
    for path, fn in cases.items():
        for mode, dt, flops in time_case(
                "fused_band_aggregate", path, fn,
                ((x_f, x_r, x_s), (0, 1, 2)), (k1, k2)):
            report("fused_band_aggregate", path, mode, dt, edges, flops)

    # --- sddmm ------------------------------------------------------------
    from gcn_tpu.ops.pallas.sddmm import sddmm, sddmm_ref

    u = jax.random.normal(jax.random.key(5), (b, n, h_dim), jnp.float32)
    v = jax.random.normal(jax.random.key(6), (b, n, h_dim), jnp.float32)
    cases = {
        "pallas": lambda uu, vv: _sq(sddmm(parent, child, mask, uu, vv)),
        "xla": lambda uu, vv: _sq(sddmm_ref(parent, child, mask, uu, vv)),
    }
    for path, fn in cases.items():
        for mode, dt, flops in time_case(
                "sddmm", path, fn, ((u, v), (0, 1)), (k1, k2)):
            report("sddmm", path, mode, dt, edges, flops)

    # --- deprel_bilinear: v1 vs v2 vs XLA einsum ---------------------------
    from gcn_tpu.ops.pallas.deprel_bilinear import (
        deprel_bilinear,
        deprel_bilinear_v2,
    )

    m_dim = b * n
    x2 = jax.random.normal(jax.random.key(7), (m_dim, t_dim), jnp.float32)
    e2 = jax.nn.one_hot(
        jax.random.randint(jax.random.key(8), (m_dim,), 0, d_dim), d_dim,
        dtype=jnp.float32,
    )
    w3 = jax.random.normal(jax.random.key(9), (d_dim, t_dim, h_dim),
                           jnp.float32) * 0.05
    b2 = jnp.zeros((d_dim, h_dim), jnp.float32)
    cases = {
        "pallas_v1": lambda xx, ee, ww, bb: _sq(
            deprel_bilinear(xx, ee, ww, bb)),
        "pallas_v2": lambda xx, ee, ww, bb: _sq(
            deprel_bilinear_v2(xx, ee, ww, bb)),
        "xla": lambda xx, ee, ww, bb: _sq(
            jnp.einsum("md,mt,dth->mh", ee, xx, ww) + ee @ bb),
    }
    for path, fn in cases.items():
        for mode, dt, flops in time_case(
                "deprel_bilinear", path, fn,
                ((x2, e2, w3, b2), (0, 1, 2, 3)), (k1, k2)):
            report("deprel_bilinear", path, mode, dt, m_dim, flops)

    # --- grouped_matmul: factored full_deprel core -------------------------
    # flagship factored shapes: both bands of layer 0 stacked (M = 2·B·N),
    # T = 2·rnn_hidden, R = 85 deprel rows + ones + zero
    from gcn_tpu.ops.pallas.grouped_matmul import grouped_matmul

    r_dim = 12 if tiny else 87
    mg = 2 * b * n
    tg = t_dim if tiny else 400
    ids_np = np.sort(
        np.random.RandomState(13).randint(0, r_dim, mg)
    ).astype(np.int32)
    gsz = jnp.asarray(np.bincount(ids_np, minlength=r_dim), jnp.int32)
    xg = jax.random.normal(jax.random.key(14), (mg, tg), jnp.float32)
    sg = jax.random.normal(jax.random.key(15), (r_dim, tg, h_dim),
                           jnp.float32) * 0.05
    cases = {
        "pallas": lambda xx, ss: _sq(grouped_matmul(xx, ss, gsz)),
        "xla_ragged": lambda xx, ss: _sq(jax.lax.ragged_dot(xx, ss, gsz)),
    }
    for path, fn in cases.items():
        for mode, dt, flops in time_case(
                "grouped_matmul", path, fn, ((xg, sg), (0, 1)), (k1, k2)):
            report("grouped_matmul", path, mode, dt, mg, flops)

    # --- bilstm: persistent Pallas kernel vs lax.scan ----------------------
    from gcn_tpu.ops.lstm import _bidirectional_fused, _bidirectional_pallas

    d_in = 32 if tiny else 360  # flagship LSTM input: emb 300 + pos + ner
    xl = jax.random.normal(jax.random.key(10), (b, n, d_in), jnp.float32)
    lengths = jnp.clip(
        jax.random.randint(jax.random.key(11), (b,), n // 2, n + 1), 2, n
    ).astype(jnp.int32)
    ks = jax.random.split(jax.random.key(12), 8)
    mk = lambda k, shp: jax.random.normal(k, shp, jnp.float32) * 0.1  # noqa: E731
    layer = {
        dr: {
            "w_ih": mk(ks[i * 4], (d_in, 4 * h_dim)),
            "w_hh": mk(ks[i * 4 + 1], (h_dim, 4 * h_dim)),
            "b_ih": mk(ks[i * 4 + 2], (4 * h_dim,)),
            "b_hh": mk(ks[i * 4 + 3], (4 * h_dim,)),
        }
        for i, dr in enumerate(("fwd", "bwd"))
    }
    cases = {
        "pallas": lambda xx: _sq(_bidirectional_pallas(xx, lengths, layer)),
        "scan_u8": lambda xx: _sq(
            _bidirectional_fused(xx, lengths, layer, 8)),
        "scan_u1": lambda xx: _sq(
            _bidirectional_fused(xx, lengths, layer, 1)),
    }
    for path, fn in cases.items():
        for mode, dt, flops in time_case(
                "bilstm", path, fn, ((xl,), (0,)), (k1, k2)):
            report("bilstm", path, mode, dt, None, flops)


if __name__ == "__main__":
    main()
