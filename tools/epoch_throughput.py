"""End-to-end epoch throughput of the PRODUCT training loop.

The headline bench (``bench.py``) times the jitted step on one reused
batch; this tool times full epochs of the real pipeline instead —
JSON-loaded dataset, per-epoch batch materialization with word dropout,
bucketed static shapes, host->device transfer, and ``Trainer.update`` —
so host-side costs and pipelining show up.  The number it prints is the
sustained rate a user actually gets from ``train.py``.

Timing is plain wall clock over whole epochs with a blocking fetch of the
updated params at the end (nothing can hide); the first epoch is excluded
(it pays one XLA compile per length bucket).

    python tools/epoch_throughput.py            # real chip, 2000 examples
    python tools/epoch_throughput.py --tiny     # CPU smoke

Prints one JSON line: sustained edges/s + sentences/s + the single-batch
bench rate for comparison.
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def build_dataset(n: int, cfg):
    """Synthetic TACRED-schema examples (make_sample_data generator) ->
    RelationDataset + Vocab, all in memory via a temp file."""
    import tempfile

    from make_sample_data import make_example

    from gcn_tpu.data.dataset import RelationDataset
    from gcn_tpu.data.vocab import Vocab

    rng = np.random.RandomState(7)
    exs = [make_example(rng, i, "tacred") for i in range(n)]
    toks: collections.Counter = collections.Counter()
    for ex in exs:
        t = list(ex["token"])
        ss, se = ex["subj_start"], ex["subj_end"]
        os_, oe = ex["obj_start"], ex["obj_end"]
        t[ss : se + 1] = ["SUBJ-" + ex["subj_type"]] * (se - ss + 1)
        t[os_ : oe + 1] = ["OBJ-" + ex["obj_type"]] * (oe - os_ + 1)
        toks.update(x.lower() for x in t)
    vocab = Vocab.from_counter(toks)
    cfg.model.vocab_size = vocab.size
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(exs, f)
        path = f.name
    return RelationDataset(path, cfg, vocab), vocab


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=3,
                   help="timed epochs (one extra warm epoch compiles)")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="scan k same-bucket batches per dispatch "
                        "(Trainer.update_chunk)")
    p.add_argument("--tiny", action="store_true", help="CPU smoke mode")
    args = p.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.n = min(args.n, 100)
        args.epochs = 1

    import jax.numpy as jnp

    import __graft_entry__ as g
    from gcn_tpu.data.dataset import Batcher
    from gcn_tpu.train.trainer import Trainer
    from gcn_tpu.utils.rng import configure_prng
    from gcn_tpu.utils.timing import diag

    cfg = g._flagship_cfg(tiny=args.tiny)
    cfg.model.compute_dtype = args.compute_dtype
    cfg.train.batch_size = args.batch_size
    cfg.train.effective_batch_size = args.batch_size  # update_gap == 1
    cfg.train.steps_per_dispatch = args.steps_per_dispatch
    configure_prng(cfg.train.prng_impl)

    t0 = time.perf_counter()
    ds, vocab = build_dataset(args.n, cfg)
    load_s = time.perf_counter() - t0
    batcher = Batcher(ds, args.batch_size, seed=1234, group_by_length=True)
    edges_per_epoch = sum(
        int(ex.graph.num_edges) for ex in ds.examples
    )
    diag(record="dataset", examples=len(ds), batches=len(batcher),
         edges_per_epoch=edges_per_epoch, load_seconds=round(load_s, 2))

    trainer = Trainer(cfg, init_batch=batcher.materialize(batcher.chunks[0]))
    red = jax.jit(lambda p: jnp.sum(p["params"]["classifier"]["bias"]))

    def run_epoch():
        spd = max(1, args.steps_per_dispatch)
        buf = []

        def flush():
            if buf:
                trainer.update_chunk(list(buf))
                buf.clear()

        for batch in batcher:
            if buf and batch["words"].shape != buf[0]["words"].shape:
                flush()
            buf.append(batch)
            if len(buf) >= spd:
                flush()
        flush()
        trainer.flush_gradients()
        float(red(trainer.params))  # block: everything enqueued has run

    t0 = time.perf_counter()
    run_epoch()  # warm: one compile per length bucket
    warm_s = time.perf_counter() - t0
    diag(record="warm_epoch", seconds=round(warm_s, 2))

    t0 = time.perf_counter()
    for _ in range(args.epochs):
        run_epoch()
    dt = (time.perf_counter() - t0) / args.epochs

    edges_rate = edges_per_epoch / dt
    sent_rate = len(ds) / dt

    # single-batch step rate on the SAME trainer/bucket mix is what
    # bench.py reports; print the ratio so pipeline losses are visible
    print(json.dumps({
        "metric": "epoch_train_throughput_edges_per_sec",
        "value": round(edges_rate, 1),
        "unit": "edges/s sustained (full product loop, wall clock)",
        "sentences_per_sec": round(sent_rate, 1),
        "seconds_per_epoch": round(dt, 3),
        "examples": len(ds),
        "batches_per_epoch": len(batcher),
        "compute_dtype": args.compute_dtype,
        "ms_per_batch_wall": round(dt / len(batcher) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
