"""Headline benchmark: flagship C-GCN training throughput on one TPU chip.

Measures the full training step (forward + backward + clip + SGD update) of
the flagship C-GCN (BiLSTM + 2 full_deprel GCN layers, hidden 200, deprel
emb 50 — the ``train_cgcn.sh`` workload) on a synthetic TACRED-shaped batch
(B=50 sentences, padded N=96, ~3.4k tree edges), and reports dependency
edges processed per second per chip.

Timing methodology (round-2 fix; the round-1 number timed an async enqueue
window and overstated ~5x):

* steps are CHAINED through their parameter dependency and execution is
  forced by a host fetch of a scalar reduced from the final state —
  ``jax.block_until_ready`` alone does not reliably await execution on the
  tunneled 'axon' TPU relay;
* per-step time is the SLOPE between two chain lengths, which cancels the
  relay's fixed round-trip latency;
* the same harness times a known-FLOPs bf16 matmul chain first and reports
  its measured fraction of the chip's peak — if that calibration is off,
  the train-step numbers cannot be trusted either;
* MFU is cross-checked against ``compiled.cost_analysis()`` FLOPs and the
  result is flagged ``timing_suspect`` if it exceeds the chip's peak.

``vs_baseline`` compares against the measured PyTorch reference step on
this machine's CPU — the reference has no TPU support (its only backends
are CUDA/CPU, reference ``train.py:93-94``; its step includes the
per-forward host tree build, ``model/gcn.py:102-112``, which this framework
moves to load time).  Provenance: ``tools/bench_reference.py`` (shared-W
full_deprel, rnn_hidden=100 — slightly LESS work than the flagship).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
...diagnostics}.  Extra diagnostic records go to stderr.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcn_tpu.utils.timing import calibrate, chip_peak, diag, slope_time

# Measured by tools/bench_reference.py on this machine (2 torch threads):
# 2888.8 ms/step over the identical synthetic forest => 1185 edges/s.
REFERENCE_EDGES_PER_SEC = 1185.3


def bench_train_step(cfg, batch, label: str):
    from gcn_tpu.models.gcn import GCNClassifier
    from gcn_tpu.parallel.train_step import make_loss_fn
    from gcn_tpu.train.optim import build_optimizer

    model = GCNClassifier(cfg.model)
    params = jax.jit(lambda r, bb: model.init(r, bb, True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch
    )
    jax.block_until_ready(params)
    tx = build_optimizer(cfg.train.optim, cfg.train.lr,
                         max_grad_norm=cfg.train.max_grad_norm,
                         topn=cfg.model.topn)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(model, cfg)
    key = jax.random.key(2)

    @jax.jit
    def full_step(p, o, b, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    flops = None
    try:
        ca = full_step.lower(params, opt_state, batch, key).compile(
        ).cost_analysis()
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # fetch a scalar derived from the UPDATED params: forces the whole
    # chain (including the last optimizer update) to execute
    red = jax.jit(
        lambda p: jnp.sum(p["params"]["classifier"]["bias"])
    )

    p, o = params, opt_state
    for _ in range(3):  # warm (also caches the compile)
        p, o, loss = full_step(p, o, batch, key)
    float(red(p))

    def chain(k):
        nonlocal p, o
        for _ in range(k):
            p, o, loss = full_step(p, o, batch, key)
        float(red(p))

    tiny = "--tiny" in sys.argv
    dt = slope_time(chain, *((2, 4) if tiny else (10, 30)),
                    repeats=2 if tiny else 5)
    edges = int(np.asarray(batch["edge_mask"]).sum())
    rec = {
        "record": f"train_step:{label}",
        "ms_per_step": round(dt * 1e3, 3),
        "edges_per_sec": round(edges / dt, 1),
    }
    if flops:
        rec["cost_analysis_flops"] = flops
        rec["mfu_vs_cost_analysis"] = round(flops / dt / chip_peak(), 3)
    diag(**rec)
    return dt, edges, flops


def bench_pair(builds, k1=10, k2=30, repeats=5):
    """Slope-time SEVERAL prepared step-chains with their (k1, k2)
    samples interleaved round-robin ACROSS the variants, so the shared
    chip's minutes-scale load swings hit every variant equally and
    RATIOS between them are trustworthy (a sequentially-benched pair can
    disagree 2x purely from the window it landed in).  ``builds`` maps
    label -> chain(k) (executes k steps, ends on a blocking fetch).
    Returns {label: seconds_per_step}."""
    from gcn_tpu.utils.timing import timeit

    t1 = {k: [] for k in builds}
    t2 = {k: [] for k in builds}
    for _ in range(repeats):
        for lbl, chain in builds.items():
            t1[lbl].append(timeit(chain, k1))
        for lbl, chain in builds.items():
            t2[lbl].append(timeit(chain, k2))
    out = {}
    for lbl in builds:
        a, b = min(t1[lbl]), min(t2[lbl])
        out[lbl] = (b - a) / (k2 - k1) if b > a else b / k2
    return out, t2


def pair_ratio(t2, num_label, den_label):
    """Robust per-step time ratio num/den from bench_pair's raw long-chain
    samples: the two chains in one repeat run back-to-back, so a load
    swing hits both and cancels in the per-repeat ratio; the median over
    repeats then rejects the occasional one-sided relay stall that a
    ratio of independent minima is defenseless against (observed: the
    same program pair measured 1.7x apart across windows)."""
    return float(np.median([a / b for a, b in
                            zip(t2[num_label], t2[den_label])]))


def prepare_train_chain(cfg, batch):
    """Compiled fused-step chain over a fixed batch (the bench_train_step
    program), returned as ``(chain, edges, flops)`` without timing it."""
    from gcn_tpu.models.gcn import GCNClassifier
    from gcn_tpu.parallel.train_step import make_loss_fn
    from gcn_tpu.train.optim import build_optimizer

    model = GCNClassifier(cfg.model)
    params = jax.jit(lambda r, bb: model.init(r, bb, True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch
    )
    jax.block_until_ready(params)
    tx = build_optimizer(cfg.train.optim, cfg.train.lr,
                         max_grad_norm=cfg.train.max_grad_norm,
                         topn=cfg.model.topn)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(model, cfg)
    key = jax.random.key(2)

    @jax.jit
    def full_step(p, o, b, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    flops = None
    try:
        ca = full_step.lower(params, opt_state, batch, key).compile(
        ).cost_analysis()
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    red = jax.jit(lambda p: jnp.sum(p["params"]["classifier"]["bias"]))
    st = {"p": params, "o": opt_state}
    for _ in range(3):
        st["p"], st["o"], _ = full_step(st["p"], st["o"], batch, key)
    float(red(st["p"]))

    def chain(k):
        for _ in range(k):
            st["p"], st["o"], _ = full_step(st["p"], st["o"], batch, key)
        float(red(st["p"]))

    return chain, int(np.asarray(batch["edge_mask"]).sum()), flops


def bench_trainer_api(cfg, batch, label: str):
    """The PRODUCT training path — ``Trainer.update`` exactly as the CLI
    drives it (fused step, in-program RNG fold).  Guards against
    regressions where the product path silently diverges from the
    hand-built benched program (round-2 example: a host-side
    ``jax.random.split`` per step cost ~10 ms of eager dispatch over the
    relay while the benched monolith ran at 2.4 ms)."""
    import jax.numpy as jnp

    from gcn_tpu.train.trainer import Trainer

    tr = Trainer(cfg, init_batch=batch)
    red = jax.jit(lambda p: jnp.sum(p["params"]["classifier"]["bias"]))
    tr.update(batch)
    float(red(tr.params))  # forces the compile + first execution

    def chain(k):
        for _ in range(k):
            tr.update(batch)
        float(red(tr.params))

    tiny = "--tiny" in sys.argv
    dt = slope_time(chain, *((2, 4) if tiny else (10, 30)),
                    repeats=2 if tiny else 5)
    edges = int(np.asarray(batch["edge_mask"]).sum())
    diag(record=f"train_step:{label}", ms_per_step=round(dt * 1e3, 3),
         edges_per_sec=round(edges / dt, 1))
    return dt, edges, tr


def prepare_product_loop(tr, batch, n_batches: int = 40):
    """One warmed product-loop pass closure for ``tr`` (Trainer.update /
    update_chunk on fresh host arrays — per-batch packing + transfer +
    dispatch all count — ended by a blocking fetch).  Returns
    ``(one_pass() -> seconds, n_batches)``."""
    import time

    import jax.numpy as jnp

    tr.update(batch)
    red = jax.jit(lambda p: jnp.sum(p["params"]["classifier"]["bias"]))
    float(red(tr.params))  # warm

    batches = [
        {k: np.array(v, copy=True) for k, v in batch.items()}
        for _ in range(n_batches)
    ]
    spd = max(1, tr.cfg.train.steps_per_dispatch)

    def one_pass():
        t0 = time.perf_counter()
        if spd > 1:
            for i in range(0, len(batches), spd):
                tr.update_chunk(batches[i : i + spd])
        else:
            for b in batches:
                tr.update(b)
        float(red(tr.params))
        return time.perf_counter() - t0

    return one_pass, n_batches


def bench_product_loop_pair(passes: dict, n_batches: int, repeats: int = 3):
    """Time SEVERAL prepared product-loop passes with their repeats
    interleaved (same rationale as ``bench_pair``: the shared chip's
    minutes-scale load swings must hit every variant equally or the
    spd8-vs-plain ratio is decided by the window, not the code — the
    round-3 artifact showed spd8 'slower' for exactly this reason).
    Returns ``({label: sec_per_batch}, {label: [per-repeat sec]})``."""
    raw = {k: [] for k in passes}
    for _ in range(repeats):
        for lbl, one_pass in passes.items():
            raw[lbl].append(one_pass())
    return {k: min(v) / n_batches for k, v in raw.items()}, raw


def prepare_eval_step(cfg, batch):
    """Warmed eval-forward chain (deterministic forward + softmax as one
    on-device fori_loop program via ``timing.device_chain``) →
    ``(chain(k), sentences, edges, flops)``."""
    from gcn_tpu.models.gcn import GCNClassifier
    from gcn_tpu.utils.timing import device_chain, step_flops

    model = GCNClassifier(cfg.model)
    params = jax.jit(lambda r, bb: model.init(r, bb, True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch
    )
    jax.block_until_ready(params)

    @jax.jit
    def step(s):
        p = jax.tree.map(
            lambda a: a + (s * 1e-30).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )
        logits, _ = model.apply(p, batch, True)
        return jax.nn.softmax(logits, axis=-1).astype(jnp.float32).sum()

    chain = device_chain(step)
    b = int(np.asarray(batch["example_mask"]).sum())
    edges = int(np.asarray(batch["edge_mask"]).sum())
    return chain, b, edges, step_flops(step, jnp.float32(0.0))


def bench_eval_pair(cfgs_batches: dict, tiny: bool):
    """Serving-path rows, packed vs unpacked, with INTERLEAVED samples
    (the sequentially-measured pair swung 1.68×→1.04× across chip-load
    windows; same rationale as bench_pair).  Returns
    {label: (dt, sentences)} and the per-repeat packed-speedup median."""
    prepared = {
        lbl: prepare_eval_step(cfg, batch)
        for lbl, (cfg, batch) in cfgs_batches.items()
    }
    dts, t2 = bench_pair(
        {lbl: p[0] for lbl, p in prepared.items()},
        **({"k1": 2, "k2": 4, "repeats": 2} if tiny else {}),
    )
    out = {}
    for lbl, (chain, b, edges, flops) in prepared.items():
        dt = dts[lbl]
        out[lbl] = (dt, b)
        rec = dict(record=f"eval_step:{lbl}",
                   ms_per_batch=round(dt * 1e3, 3),
                   sentences_per_sec=round(b / dt, 1),
                   edges_per_sec=round(edges / dt, 1))
        if flops:
            rec["cost_analysis_flops"] = flops
        diag(**rec)
    return out, t2


def main() -> None:
    import os

    # persistent XLA compile cache: the remote TPU compile service costs
    # ~1 min/program cold (much more when the 2-core host is loaded);
    # the cache is keyed by config+HLO so stale reuse is impossible
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_tpu_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import __graft_entry__ as g

    tiny = "--tiny" in sys.argv  # CPU smoke mode for tests
    from gcn_tpu.utils.rng import configure_prng

    configure_prng("auto")  # the product default (TrainConfig.prng_impl)
    calib_frac = calibrate() if not tiny else 1.0
    # the suspect band is for catching multi-x methodology errors (the
    # round-1 failure mode), not the ±10% run-to-run clock/relay jitter
    # observed on this tunneled chip
    timing_suspect = not (0.25 <= calib_frac <= 1.2)

    b, n = (8, 32) if tiny else (50, 96)
    results = {}
    flops = None
    # xla/pallas = the GCN-aggregation path (the BiLSTM uses the
    # persistent Pallas kernel on TPU in all rows, rnn_impl="auto");
    # bf16 = mixed precision (bf16 matmuls, fp32 params/accumulators) —
    # the TPU-idiomatic training mode, quality-tested in the suite.
    variants = (
        ("xla", False, "float32"),
        ("pallas", True, "float32"),
        ("bf16", False, "bfloat16"),
    )
    for label, use_pallas, dtype in variants:
        cfg = g._flagship_cfg(tiny=tiny)
        cfg.model.use_pallas = use_pallas
        cfg.model.compute_dtype = dtype
        batch = g._synthetic_batch(cfg, b=b, n=n)
        dt, edges, fl = bench_train_step(cfg, batch, label)
        results[label] = (dt, edges, fl)
        flops = flops or fl

    # the attention aggregation mode (new surface vs the reference) —
    # edge-softmax over deprel-gated scores through the Pallas SDDMM
    # (the one sentence-scale kernel that beats XLA, 2.6x)
    cfg = g._flagship_cfg(tiny=tiny)
    cfg.model.adj_type = "attention"
    cfg.model.compute_dtype = "bfloat16"
    batch = g._synthetic_batch(cfg, b=b, n=n)
    dt, edges, fl = bench_train_step(cfg, batch, "attention_bf16")
    results["attention_bf16"] = (dt, edges, fl)

    # Sentence-packed flagship (PackedBatcher layout): same [rows, N]
    # program geometry but rows carry ~2.4x the sentences of the
    # one-per-row layout on a TACRED-like length distribution (mean ~36
    # vs the 96 bucket) — the padding-waste reclaim, plus a chip-filling
    # row sweep.  Edge counts are REAL edges (more sentences per
    # program), so edges/s compares directly with the rows above.
    # slots=1 = the same TACRED-like corpus (mean sentence ~36 tokens)
    # laid out one sentence per 96-token row — the layout the reference
    # is stuck with (dense [B,N,N] is one sentence per row by
    # construction).  The packed/unpacked edges-per-sec ratio is the
    # corpus-throughput win packing buys.  The two programs are timed
    # with INTERLEAVED samples (bench_pair): sequential measurement let
    # the shared chip's load swings fake the ratio in either direction.
    packed_mfu = None
    pair = {}
    rows = 8 if tiny else 50
    for slots, label in ((1, "unpacked_realistic"),
                         (2 if tiny else 8, "packed")):
        cfg = g._flagship_cfg(tiny=tiny)
        cfg.model.compute_dtype = "bfloat16"
        pb = g._synthetic_packed_batch(cfg, rows=rows, n=n, s=slots)
        pair[label] = prepare_train_chain(cfg, pb)
    dts, pair_t2 = bench_pair(
        {k: v[0] for k, v in pair.items()},
        **({"k1": 2, "k2": 4, "repeats": 2} if tiny else {}),
    )
    for label, (chain, edges, fl) in pair.items():
        dt = dts[label]
        results[label] = (dt, edges, fl)
        rec = {"record": f"train_step:{label}",
               "ms_per_step": round(dt * 1e3, 3),
               "edges_per_sec": round(edges / dt, 1)}
        if label == "unpacked_realistic":
            # why this row is ~2.6x below trainer_api/packed: one
            # mean-36-token sentence per 96-token row leaves ~60% of
            # every program's node rows as padding, and edges/s counts
            # REAL edges only — the padding waste IS the measurement.
            # --pack_sentences reclaims it (the packed/trainer_api rows);
            # this row is the reference's forced layout, kept as the
            # honest unpacked baseline.
            rec["note"] = ("1 sentence/row layout: ~60% row padding; "
                          "packing reclaims it (see packed/trainer_api)")
        if fl:
            rec["mfu_vs_cost_analysis"] = round(fl / dt / chip_peak(), 3)
            if label == "packed":
                packed_mfu = rec["mfu_vs_cost_analysis"]
        diag(**rec)

    # the PRODUCT path (Trainer.update as the CLI drives it) — must stay
    # within noise of the fastest hand-built variant
    cfg = g._flagship_cfg(tiny=tiny)
    cfg.model.compute_dtype = "bfloat16"
    api_batch = g._synthetic_batch(cfg, b=b, n=n)
    api_dt, api_edges, api_tr = bench_trainer_api(cfg, api_batch,
                                                  "trainer_api")
    results["trainer_api"] = (api_dt, api_edges, None)

    # sustained wall-clock product loop (fresh host arrays per batch:
    # packing + transfer + dispatch all count; ends on a blocking fetch),
    # plain vs k-steps-per-dispatch chunking (one transfer + one program
    # per k steps — the recommended TPU mode, bit-identical), with the
    # two variants' repeats INTERLEAVED so the spd8/plain ratio survives
    # the chip's load swings
    from gcn_tpu.train.trainer import Trainer as _Trainer

    cfg8 = g._flagship_cfg(tiny=tiny)
    cfg8.model.compute_dtype = "bfloat16"
    cfg8.train.steps_per_dispatch = 8
    tr8 = _Trainer(cfg8, init_batch=api_batch)
    tr8.update_chunk([api_batch] * (2 if tiny else 8))  # compile the scan
    nb = 4 if tiny else 40
    loop_passes = {
        "bf16": prepare_product_loop(api_tr, api_batch, nb)[0],
        "bf16_spd8": prepare_product_loop(tr8, api_batch, nb)[0],
    }
    loop_dts, loop_raw = bench_product_loop_pair(
        loop_passes, nb, repeats=2 if tiny else 4)
    loop_dt, loop8_dt = loop_dts["bf16"], loop_dts["bf16_spd8"]
    loop_edges = loop8_edges = int(
        np.asarray(api_batch["edge_mask"]).sum())
    for lbl in loop_passes:
        diag(record=f"product_loop:{lbl}",
             ms_per_batch=round(loop_dts[lbl] * 1e3, 3),
             edges_per_sec=round(loop_edges / loop_dts[lbl], 1))
    # per-repeat ratio (load swings hit both passes of a repeat): the
    # dispatch-batching win the spd>1 mode exists for
    spd8_speedup = float(np.median(
        [a / b for a, b in zip(loop_raw["bf16"], loop_raw["bf16_spd8"])]))

    # inference throughput (serving path) — diagnostic record on stderr;
    # the packed row is the same corpus packed ~2x denser (serving gets
    # the same padding-waste reclaim as training); the pair is timed
    # interleaved so the serving-packing ratio survives load windows
    cfg = g._flagship_cfg(tiny=tiny)
    cfg.model.compute_dtype = "bfloat16"
    eval_rows, eval_t2 = bench_eval_pair({
        "bf16": (cfg, g._synthetic_batch(cfg, b=b, n=n)),
        "packed_bf16": (cfg, g._synthetic_packed_batch(
            cfg, rows=b, n=n, s=2 if tiny else 8)),
    }, tiny)
    eval_dt, eval_b = eval_rows["bf16"]
    evalp_dt, evalp_b = eval_rows["packed_bf16"]

    # large-forest row (BASELINE configs[4] single-chip leg): one GCN
    # layer fwd+bwd over a 65k-node synthetic forest in its measured-best
    # layout — short packed rows + dense banded matmul (the full sweep
    # incl. the block-dense Pallas kernel and the O(E) edge-list path is
    # tools/large_forest_bench.py; dense-at-N=128 won every round, so the
    # fused SpMM stays retired for throughput and the edge-list path
    # covers the giant-row/memory regime).
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "tools"))
    import large_forest_bench as _lf

    lf_total, lf_n = (512, 64) if tiny else (65536, 128)
    lf_par, lf_ch, lf_mask = _lf.forest_rows(lf_total, lf_n)
    lf_b = lf_total // lf_n
    lf_edges = int(np.asarray(lf_mask).sum())
    lf_key = jax.random.key(0)
    lf_h = jax.random.normal(lf_key, (lf_b, lf_n, 256), jnp.bfloat16)
    lf_w = jax.random.normal(lf_key, (256, 256), jnp.bfloat16) * 0.05
    lf_bias = jnp.zeros((256,), jnp.bfloat16)
    lf_dt = _lf.bench_backend(
        "dense", _lf.dense_layer, lf_par, lf_ch, lf_mask,
        lf_h, lf_w, lf_bias, lf_edges, tiny=tiny,
    )

    # headline = the highest measured corpus throughput (edges/s); all
    # configurations are reported.  (min-dt would mis-rank the packed
    # rows, whose programs carry more real edges at similar step time.)
    label = max(results, key=lambda k: results[k][1] / results[k][0])
    dt, edges, hl_flops = results[label]
    value = edges / dt
    hl_flops = hl_flops or flops
    mfu = round(hl_flops / dt / chip_peak(), 3) if hl_flops else None
    if mfu is not None and mfu > 1.0:
        timing_suspect = True

    rates = {
        f"{k}_edges_per_sec": round(v[1] / v[0], 1)
        for k, v in results.items()
    }
    rates["eval_sentences_per_sec"] = round(eval_b / eval_dt, 1)
    rates["eval_packed_sentences_per_sec"] = round(evalp_b / evalp_dt, 1)
    # serving-packing win from the interleaved pair's per-repeat medians
    rates["eval_packing_speedup"] = round(
        (evalp_b / eval_b) / pair_ratio(eval_t2, "packed_bf16", "bf16"), 2)
    if packed_mfu is not None:
        rates["packed_mfu_vs_cost_analysis"] = packed_mfu
    if "packed" in results and "unpacked_realistic" in results:
        # edges ratio x robust per-repeat time ratio (see pair_ratio)
        edge_ratio = results["packed"][1] / results["unpacked_realistic"][1]
        rates["packing_corpus_speedup"] = round(
            edge_ratio / pair_ratio(pair_t2, "packed",
                                    "unpacked_realistic"), 2)
    rates["sustained_loop_edges_per_sec"] = round(loop_edges / loop_dt, 1)
    rates["sustained_loop_spd8_edges_per_sec"] = round(
        loop8_edges / loop8_dt, 1)
    rates["spd8_vs_plain_speedup"] = round(spd8_speedup, 3)
    if lf_dt:
        rates["large_forest_layer_edges_per_sec"] = round(
            lf_edges / lf_dt, 1)
    print(json.dumps({
        "metric": "cgcn_train_step_edges_per_sec",
        "value": round(value, 1),
        "unit": "edges/s/chip (fwd+bwd+update, fully executed)",
        "vs_baseline": round(value / REFERENCE_EDGES_PER_SEC, 1),
        "fastest_path": label,
        "ms_per_step": round(dt * 1e3, 3),
        **rates,
        "mfu_vs_cost_analysis": mfu,
        "calibration_fraction_of_peak": round(calib_frac, 3),
        "timing_suspect": timing_suspect,
        "baseline_note": "measured torch reference, "
                         "tools/bench_reference.py: 1185 edges/s CPU",
        # the attention mode is not a speed-only headline: the round-5
        # 11-seed off-ceiling campaign (design.md §8 item 6) measured it
        # at mean best-dev 0.746 / worst 0.714 vs the reference
        # flagship's 0.677 on identical data
        "attention_quality_note": "11-seed hard-task campaign: "
                                  "attention best-dev mean 0.746 "
                                  "(worst 0.714) vs reference full_"
                                  "deprel 0.677 — design.md §8 item 6",
    }))


if __name__ == "__main__":
    main()
