"""AOT-compile the sharded train step for a REAL TPU topology and audit
the optimized HLO schedule (no hardware needed).

``jax.experimental.topologies.get_topology_desc`` yields abstract devices
for a named TPU topology (e.g. ``v5e:2x4``); ``jax.jit(...).lower(...)``
against ShapeDtypeStructs with NamedShardings on that topology runs the
full XLA:TPU pipeline — GSPMD partitioning, collective lowering, the
final instruction SCHEDULE, and per-device memory analysis — producing
evidence the CPU virtual-mesh tests structurally cannot:

* that the fused halo/edges train steps compile for real multi-chip TPU
  at all (this audit caught the Mosaic-kernels-cannot-be-auto-partitioned
  failure of the unwrapped persistent LSTM, fixed in ``ops/lstm.py``),
* whether the halo boundary exchange lowers async (start/done pair) and
  what is scheduled inside its window (the ``parallel/halo.py``
  overlapped-with-local-aggregation claim),
* the merged fwd+rev band exchange: ONE ``_part_agg_pair`` all-to-all
  per layer per pass, visible by op_name,
* whether any collective moves a full ``[B, N, H]`` node-feature tensor
  (the halo mode's memory-scaling property), and
* per-device argument/temp memory for halo vs edges vs plain DP.

The reference has no multi-device story at all (reference
``train.py:93-94``); this is the framework's differentiating surface
(SURVEY.md §2b row 6).

Usage::

    python tools/aot_topology.py                       # v5e:2x4, all modes
    python tools/aot_topology.py --topology v5e:4x4
    python tools/aot_topology.py --modes halo --async_a2a --excerpt

Each mode prints one JSON line; ``--excerpt`` dumps the scheduled HLO
around the first halo all-to-all to ``/tmp/aot_<mode>_excerpt.txt``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HALO_A2A_TAG = "_part_agg_pair/shard_map/all_to_all"


def build_step(mode: str, mesh, n: int = 16, b_per_data: int = 4,
               tiny: bool = True):
    """(fused_step, arg ShapeDtypeStructs) for one graph-partition mode.

    ``mode``: "none" | "edges" | "halo" | "attn_edges" — tiny flagship
    C-GCN config, synthetic batch, same construction as
    ``__graft_entry__.dryrun_multichip``.
    """
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from gcn_tpu.models.gcn import GCNClassifier
    from gcn_tpu.parallel.halo import attach_halo_plans
    from gcn_tpu.parallel.mesh import (
        batch_shardings,
        opt_shardings,
        param_shardings,
    )
    from gcn_tpu.parallel.train_step import make_loss_fn
    from gcn_tpu.train.optim import build_optimizer

    cfg = _flagship_cfg(tiny=tiny)
    if mode in ("attn_edges", "attn_halo"):
        cfg.model.adj_type = "attention"
        cfg.model.graph_partition = mode.split("_", 1)[1]
    elif mode != "none":
        cfg.model.graph_partition = mode
    b = mesh.shape["data"] * b_per_data
    batch = _synthetic_batch(cfg, b=b, n=n)
    if cfg.model.graph_partition == "halo":
        batch = attach_halo_plans(batch, n, mesh.shape["model"])
    model = GCNClassifier(cfg.model)

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    params_s = jax.eval_shape(lambda: model.init(rngs, batch, True))
    tx = build_optimizer(cfg.train.optim, cfg.train.lr,
                         max_grad_norm=cfg.train.max_grad_norm,
                         topn=cfg.model.topn)
    opt_s = jax.eval_shape(tx.init, params_s)

    rep_dep = cfg.model.graph_partition == "halo"
    p_shard = param_shardings(mesh, params_s, replicate_deprel=rep_dep)
    o_shard = opt_shardings(mesh, opt_s, params_s,
                            replicate_deprel=rep_dep)
    b_shard = batch_shardings(mesh, batch)

    loss_fn = make_loss_fn(model, cfg, mesh=mesh)

    @partial(jax.jit, donate_argnums=(0, 1))
    def fused_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def sds(tree, shard):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                np.shape(x), getattr(x, "dtype", np.asarray(x).dtype),
                sharding=s),
            tree, shard)

    key_ab = jax.eval_shape(lambda: jax.random.key(2))
    key_s = jax.ShapeDtypeStruct(key_ab.shape, key_ab.dtype,
                                 sharding=NamedSharding(mesh, P()))
    args = (sds(params_s, p_shard), sds(opt_s, o_shard),
            sds(batch, b_shard), key_s)
    return fused_step, args, (b, n, cfg)


_COLL = re.compile(
    r"^\s*(%\S+)\s*=\s*[(\s]*(\w+)\[([0-9,]*)\]\S*[^=]*?\s"
    r"(all-to-all|all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(-start|-done)?\(", re.M)
_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def audit_hlo(txt: str, full_feature_elems: int):
    """Census the scheduled HLO's collectives.

    ``full_feature_elems`` = B·N·H of the (global) node-feature tensor —
    any single collective moving at least that many elements counts as a
    "full-tensor collective" (what halo mode exists to avoid).
    """
    ops = []
    for m in _COLL.finditer(txt):
        name, dt, shape, kind, phase = m.groups()
        elems = int(np.prod([int(x) for x in shape.split(",") if x] or [1]))
        line = txt[m.start():txt.index("\n", m.start())]
        om = re.search(r'op_name="([^"]*)"', line)
        ops.append({
            "name": name, "kind": kind + (phase or ""),
            "dtype": dt, "elems": elems,
            "bytes": elems * _DTYPE_BYTES.get(dt, 4),
            "op_name": om.group(1) if om else "",
        })
    halo_a2a = [o for o in ops if HALO_A2A_TAG in o["op_name"]
                and o["kind"] in ("all-to-all", "all-to-all-start")]
    kinds: dict[str, int] = {}
    for o in ops:
        kinds[o["kind"]] = kinds.get(o["kind"], 0) + 1
    # data-moving collectives at/above the full node-feature tensor size
    full = [o for o in ops if o["elems"] >= full_feature_elems
            and o["kind"].split("-start")[0].split("-done")[0]
            in ("all-gather", "all-to-all", "all-reduce")]
    return {
        "collective_counts": kinds,
        "halo_exchange_a2a": len(halo_a2a),
        "halo_exchange_async": sum(
            1 for o in halo_a2a if o["kind"].endswith("-start")),
        "full_tensor_collectives": len(full),
        "full_tensor_detail": sorted(
            {f'{o["kind"]} {o["dtype"]}[{o["elems"]}] {o["op_name"][:80]}'
             for o in full})[:8],
        "largest_collective_bytes": max((o["bytes"] for o in ops),
                                        default=0),
    }


def overlap_window(txt: str):
    """Ops scheduled between the first async halo a2a start/done pair
    (TPU compiled modules are printed in schedule order)."""
    lines = txt.splitlines()
    start = done = None
    sname = None
    for i, ln in enumerate(lines):
        if (start is None and "all-to-all-start" in ln
                and HALO_A2A_TAG in ln):
            start = i
            m = re.match(r"\s*(%\S+)\s*=", ln)
            sname = m.group(1) if m else None
        elif (start is not None and "all-to-all-done" in ln
                and (sname is None or sname + ")" in ln
                     or sname + "," in ln or sname + " " in ln)):
            done = i
            break
    if start is None or done is None:
        return None
    window = lines[start + 1:done]
    fusions = sum(1 for ln in window if re.search(r"= \S+ fusion\(", ln))
    return {"window_ops": len(window), "window_fusions": fusions}


def run_mode(mode, mesh, async_a2a=False, excerpt=False, n=16,
             b_per_data=4, tiny=True):
    import jax

    fused_step, args, (b, n, cfg) = build_step(mode, mesh, n=n,
                                               b_per_data=b_per_data,
                                               tiny=tiny)
    lowered = fused_step.lower(*args)
    opts = {}
    if async_a2a:
        opts["xla_tpu_enable_async_all_to_all"] = "true"
    compiled = lowered.compile(compiler_options=opts or None)
    ma = compiled.memory_analysis()
    txt = compiled.as_text()
    h = cfg.model.hidden_dim
    rec = {
        "record": "aot_topology", "mode": mode,
        "mesh": dict(mesh.shape), "batch": b, "nodes": n,
        "async_a2a_flag": async_a2a,
        "argument_bytes_per_device": ma.argument_size_in_bytes,
        "output_bytes_per_device": ma.output_size_in_bytes,
        "temp_bytes_per_device": ma.temp_size_in_bytes,
        "code_bytes": ma.generated_code_size_in_bytes,
        **audit_hlo(txt, b * n * h),
    }
    ow = overlap_window(txt)
    if ow:
        rec["halo_overlap"] = ow
    if excerpt:
        path = f"/tmp/aot_{mode}_excerpt.txt"
        keep = []
        lines = txt.splitlines()
        for i, ln in enumerate(lines):
            if HALO_A2A_TAG in ln:
                keep.extend(lines[max(0, i - 3):i + 8])
                keep.append("...")
        open(path, "w").write("\n".join(keep))
        rec["excerpt"] = path
    return rec


def make_topology_mesh(topology: str, num_slices: int = 1):
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topology, num_slices=num_slices)
    devs = np.array(topo.devices)
    k = devs.size
    model = 4 if k % 4 == 0 else 2
    # slice-major device order: with multiple slices put `data` across
    # slices (gradient psum rides DCN) and keep `model` (halo exchange)
    # on intra-slice ICI
    return Mesh(devs.reshape(k // model, model), ("data", "model"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--num_slices", type=int, default=1)
    ap.add_argument("--modes", default="none,edges,halo,attn_edges,attn_halo")
    ap.add_argument("--async_a2a", action="store_true",
                    help="compile with xla_tpu_enable_async_all_to_all")
    ap.add_argument("--excerpt", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="flagship-scale shapes (N=96, B=8/data-shard, "
                    "full hidden dims) instead of the tiny config")
    args = ap.parse_args()
    mesh = make_topology_mesh(args.topology, args.num_slices)
    for mode in args.modes.split(","):
        rec = run_mode(
            mode, mesh, async_a2a=args.async_a2a, excerpt=args.excerpt,
            n=96 if args.full else 16, b_per_data=8 if args.full else 4,
            tiny=not args.full)
        rec["topology"] = args.topology
        rec["num_slices"] = args.num_slices
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
