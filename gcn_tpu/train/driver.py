"""Epoch-loop driver shared by the TACRED and SemEval CLIs.

Reproduces the training policy of the reference drivers
(``train.py:158-348``, ``train_semeval.py``): per-epoch train/dev/test
evaluation with the official scorer, best-model tracking (dev-F1 for TACRED;
train-F1 when no dev split exists, as SemEval does —
``train_semeval.py:256-262``), per-epoch checkpoints with ``save_epoch``
retention, plateau LR decay for sgd/adagrad/adadelta, TSV logging, confusion
matrices and misclassified-example dumps at each new best.

Deliberate fixes over the reference: artifacts are written into the run
directory (the reference writes misclassified dumps into the *dataset*
directory, ``train.py:310-319``); checkpoints carry optimizer state; training
defaults to the full train file (the reference hard-codes the
``train_0.1.json`` 10% subsample, ``train.py:159``).
"""

from __future__ import annotations

import os
import pickle
import time
from datetime import datetime
from shutil import rmtree

import numpy as np

from gcn_tpu.config import Config
from gcn_tpu.data.dataset import Batcher, RelationDataset, constants_for
from gcn_tpu.data.vocab import Vocab
from gcn_tpu.train import scorer
from gcn_tpu.train.logger import FileLogger, ensure_dir, print_config
from gcn_tpu.train.trainer import Trainer


def load_word_embeddings(cfg: Config, vocab: Vocab):
    if cfg.model.use_bert_embeddings:
        return None
    emb_file = os.path.join(cfg.data.vocab_dir, "embedding.npy")
    if not os.path.exists(emb_file):
        print(f"[warn] no embedding matrix at {emb_file}; using random init")
        return None
    emb = np.load(emb_file)
    assert emb.shape[0] == vocab.size, (emb.shape, vocab.size)
    assert emb.shape[1] == cfg.model.emb_dim, (emb.shape, cfg.model.emb_dim)
    return emb


def find_latest_checkpoint(run_dir: str) -> str | None:
    """Most recent checkpoint in a run directory (step checkpoints beat
    their epoch's checkpoint by global step), else best_model."""
    if not os.path.isdir(run_dir):
        return None
    best_key, best_name = None, None
    for name in os.listdir(run_dir):
        for prefix, kind in (("checkpoint_epoch_", 0),
                             ("checkpoint_step_", 1)):
            if not name.startswith(prefix) or name.endswith(".tmp"):
                continue
            try:
                num = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            try:
                with open(os.path.join(run_dir, name, "meta.json")) as f:
                    import json as _json

                    meta = _json.load(f).get("meta", {})
                step = int(meta.get("global_step") or 0)
                epoch = int(meta.get("epoch") or num)
            except OSError:
                continue
            key = (step, epoch, kind)
            if best_key is None or key > best_key:
                best_key, best_name = key, name
    if best_name:
        return os.path.join(run_dir, best_name)
    best = os.path.join(run_dir, "best_model")
    return best if os.path.isdir(best) else None


def prune_checkpoints(run_dir: str, epoch: int, save_epoch: int,
                      keep_latest: int = 1) -> None:
    """Reference retention (keep ``save_epoch`` multiples,
    ``train.py:336-337``) plus: always keep the newest ``keep_latest``
    epoch checkpoints, so ``--resume`` never falls back a full run."""
    epochs = []
    for name in os.listdir(run_dir):
        if name.startswith("checkpoint_epoch_") and not name.endswith(".tmp"):
            try:
                epochs.append(int(name.rsplit("_", 1)[1]))
            except ValueError:
                continue
    keep = set(sorted(epochs)[-max(keep_latest, 0):]) if keep_latest else set()
    for e in epochs:
        if e % save_epoch != 0 and e not in keep:
            rmtree(os.path.join(run_dir, f"checkpoint_epoch_{e}"))
    # a completed epoch supersedes its in-flight step checkpoints
    for name in list(os.listdir(run_dir)):
        if name.startswith("checkpoint_step_") and not name.endswith(".tmp"):
            rmtree(os.path.join(run_dir, name))


def run_training(
    cfg: Config,
    bert_embeddings: dict | None = None,
    load_from: str | None = None,
    profile_dir: str | None = None,
    resume: bool = False,
) -> dict:
    # multi-host bootstrap FIRST (before anything touches the jax backend);
    # no-op unless the env (GCN_TPU_COORDINATOR / TPU pod vars) is set
    from gcn_tpu.parallel import distributed

    distributed.initialize()

    C = constants_for(cfg.model.dataset)
    np.random.seed(cfg.train.seed)

    vocab = Vocab.load(os.path.join(cfg.data.vocab_dir, "vocab.pkl"))
    cfg.model.vocab_size = vocab.size
    cfg.model.num_class = len(C.LABEL_TO_ID)
    emb_matrix = load_word_embeddings(cfg, vocab)
    if cfg.model.use_bert_embeddings:
        cfg.model.emb_dim = 1024  # reference train.py:143-144

    data_dir = cfg.data.data_dir
    print(f"Loading data from {data_dir} with batch size "
          f"{cfg.train.batch_size}...")
    train_ds = RelationDataset(
        os.path.join(data_dir, cfg.data.train_file), cfg, vocab,
        bert_embeddings=bert_embeddings,
    )
    dev_path = os.path.join(data_dir, cfg.data.dev_file)
    dev_ds = (
        RelationDataset(dev_path, cfg, vocab, evaluation=True,
                        bert_embeddings=bert_embeddings)
        if os.path.exists(dev_path)
        else None
    )
    test_ds = RelationDataset(
        os.path.join(data_dir, cfg.data.test_file), cfg, vocab,
        evaluation=True, bert_embeddings=bert_embeddings,
    )

    bs = cfg.train.batch_size
    ebs = cfg.train.eval_batch_size or bs
    if cfg.data.pack_sentences > 0:
        if cfg.model.use_bert_embeddings:
            raise ValueError(
                "--pack_sentences does not support BERT embedding inputs"
                " (float [L,D] word vectors; PackedBatcher packs integer"
                " token ids) — use --pack_sentences 0 with"
                " --use_bert_embeddings"
            )
        # cross-sentence packing: several sentences per node row, exact
        # per-example math (PackedBatcher docstring); batch_size counts
        # ROWS here
        from gcn_tpu.data.dataset import PackedBatcher

        def _packed(ds, evaluation):
            return PackedBatcher(
                ds, ebs if evaluation else bs,
                pack_len=cfg.data.pack_len or None,
                max_slots=cfg.data.pack_sentences,
                evaluation=evaluation, seed=cfg.train.seed,
            )

        train_batcher = _packed(train_ds, False)
        train_eval_batcher = _packed(train_ds, True)
        dev_batcher = _packed(dev_ds, True) if dev_ds else None
        test_batcher = _packed(test_ds, True)
    else:
        train_batcher = Batcher(train_ds, bs, seed=cfg.train.seed,
                                group_by_length=cfg.data.group_by_length)
        train_eval_batcher = Batcher(train_ds, ebs, evaluation=True)
        dev_batcher = (Batcher(dev_ds, ebs, evaluation=True)
                       if dev_ds else None)
        test_batcher = Batcher(test_ds, ebs, evaluation=True)

    import jax

    is_chief = jax.process_index() == 0

    model_id = cfg.id if len(cfg.id) > 1 else "0" + cfg.id
    run_dir = os.path.join(cfg.model_save_dir, model_id)
    if is_chief:
        ensure_dir(run_dir)
        cfg.save(os.path.join(run_dir, "config.json"))
        vocab.save(os.path.join(run_dir, "vocab.pkl"))
    file_logger = FileLogger(
        os.path.join(run_dir, cfg.log),
        header="# epoch\ttrain_loss\tdev_loss\tdev_score\tbest_dev_score",
        append=resume,
    ) if is_chief else None
    if is_chief:
        print_config(cfg.to_dict())

    if jax.process_count() > 1:
        # multi-host: one SPMD program over all processes' devices; every
        # process feeds its slice of each global batch
        from gcn_tpu.data.sharding import ShardedBatcher
        from gcn_tpu.train.distributed_trainer import MultiHostTrainer

        print(f"Multi-host training: {distributed.runtime_info()}")
        trainer = MultiHostTrainer(cfg, emb_matrix=emb_matrix)
        train_batcher = ShardedBatcher(train_batcher)
        train_eval_batcher = ShardedBatcher(train_eval_batcher)
        if dev_batcher is not None:
            dev_batcher = ShardedBatcher(dev_batcher)
        test_batcher = ShardedBatcher(test_batcher)
    elif len(jax.devices()) > 1:
        from gcn_tpu.train.distributed_trainer import DistributedTrainer

        print(f"Using DistributedTrainer over {len(jax.devices())} devices")
        trainer = DistributedTrainer(cfg, emb_matrix=emb_matrix)
    else:
        trainer = Trainer(cfg, emb_matrix=emb_matrix)
    if (cfg.model.graph_partition == "halo"
            and getattr(trainer, "_partition_mesh", None) is not None):
        # every batch needs static-shape halo exchange plans for the
        # mesh's model axis (parallel.halo.attach_halo_plans)
        k_halo = trainer.mesh.shape["model"]
        if k_halo > 1:
            for b in (train_batcher, train_eval_batcher, dev_batcher,
                      test_batcher):
                if b is not None:
                    b.halo_devices = k_halo
    start_epoch = 1
    skip_batches = 0
    resumed_step = 0
    resumed_best = None
    if resume:
        # elastic recovery: pick up the newest checkpoint in the run dir
        # (params + optimizer state + lr + epoch + best metrics; the
        # reference could only warm-start weights manually and lost the
        # epoch counter and optimizer — train.py:186-195).  Step
        # checkpoints (save_steps > 0) resume MID-epoch: batch order is
        # fixed per run (reference data/loader.py:31-41 semantics), so the
        # already-consumed batches are skipped exactly.
        latest = find_latest_checkpoint(run_dir)
        if latest:
            meta = trainer.load(latest)
            resumed_step = int(meta.get("global_step") or 0)
            if meta.get("step_in_epoch") is not None:
                start_epoch = max(int(meta.get("epoch") or 1), 1)
                skip_batches = int(meta["step_in_epoch"])
            else:
                start_epoch = int(meta.get("epoch") or 0) + 1
            resumed_best = meta.get("best_metrics")
            print(f"Resumed from {latest}; continuing at epoch "
                  f"{start_epoch}"
                  + (f" batch {skip_batches}" if skip_batches else ""))
        else:
            print(f"No checkpoint found in {run_dir}; starting fresh")
    if load_from:
        # warm start (reference train.py:186-195); optimizer state is
        # restored too (the reference resets it)
        meta = trainer.load(load_from)
        print(f"Loaded pretrained model from {load_from} "
              f"(epoch {meta.get('epoch')})")
    id2label = {v: k for k, v in C.LABEL_TO_ID.items()}
    neg = cfg.train.scorer_negative_label or C.NEGATIVE_LABEL

    selection_history: list[float] = []
    best_metrics = {"f1": -np.inf, "precision": -np.inf, "recall": -np.inf}
    test_at_best = dict(best_metrics)
    current_lr = cfg.train.lr
    global_step = resumed_step
    max_steps = len(train_batcher) * cfg.train.num_epoch
    fmt = ("{}: step {}/{} (epoch {}/{}), loss = {:.6f} "
           "({:.3f} sec/batch), lr: {:.6f}")

    def run_eval(batcher):
        preds, _, loss = trainer.evaluate(batcher)
        labels = [id2label[p] for p in preds]
        p, r, f1 = scorer.score(batcher.gold(), labels, negative_label=neg)
        return labels, loss, {"f1": f1, "precision": p, "recall": r}

    from gcn_tpu.train.profiling import ThroughputMeter, trace

    meter = ThroughputMeter()
    profiled = False

    if resumed_best:
        best_metrics = resumed_best

    spd = max(1, int(cfg.train.steps_per_dispatch))
    use_chunks = (spd > 1 and cfg.train.update_gap <= 1
                  and getattr(trainer, "_pack", False))

    wm = str(cfg.train.warmup_compile).lower()
    if ((wm in ("true", "1", "yes") or (wm == "auto" and spd > 1))
            and jax.process_count() == 1):
        # pre-compile the whole program set with overlapped compile RPCs;
        # threaded warmup is single-process only (pool completion order
        # would diverge across processes and deadlock SPMD dispatch)
        # train-batcher shapes compile the training programs; dev/test/
        # train-eval shapes compile ONLY the eval programs (a full train
        # program for an eval-only shape costs ~1 min at flagship shapes
        # and is never dispatched)
        reps = train_batcher.warmup_batches()
        eval_reps = []
        for b in (dev_batcher, test_batcher, train_eval_batcher):
            if b is not None:
                eval_reps += b.warmup_batches()
        t0 = time.time()
        stats = trainer.warmup(reps, eval_batches=eval_reps)
        print(f"warmup: compiled {stats['programs']} programs in "
              f"{time.time() - t0:.1f}s ({len(reps)} batch shapes)")

    for epoch in range(start_epoch, cfg.train.num_epoch + 1):
        epoch_losses = []  # device scalars: converted once per epoch so the
        meter.start()      # step loop never blocks on a device round-trip

        def step_bookkeeping(i, batch, loss, sec, epoch=epoch):
            epoch_losses.append(loss)
            meter.step(int(batch["edge_mask"].sum()),
                       int(batch["example_mask"].sum()))
            if global_step % cfg.train.log_step == 0:
                print(fmt.format(
                    datetime.now(), global_step, max_steps, epoch,
                    cfg.train.num_epoch, float(loss), sec, current_lr,
                ) + f" [{meter.summary()}]")
            if (cfg.train.save_steps
                    and global_step % cfg.train.save_steps == 0):
                step_dir = os.path.join(
                    run_dir, f"checkpoint_step_{global_step}"
                )
                trainer.save(step_dir, epoch=epoch, extra_meta={
                    "best_metrics": best_metrics, "step_in_epoch": i + 1,
                })
                if is_chief:
                    from gcn_tpu.train import checkpoint as _ckpt

                    _ckpt.wait_for_async_saves()
                    for name in os.listdir(run_dir):
                        if (name.startswith("checkpoint_step_")
                                and not name.endswith(".tmp")
                                and name != f"checkpoint_step_{global_step}"):
                            rmtree(os.path.join(run_dir, name))

        buf: list = []
        buf_t0 = 0.0

        def flush_buf():
            # one dispatch + one host->device transfer for the whole
            # buffer (Trainer._chunk_step lax.scan); bookkeeping replays
            # per step from the returned loss vector.  Chunks are cut at
            # save_steps boundaries so step checkpoints always snapshot
            # exactly-global_step state.
            nonlocal buf, buf_t0, global_step, profiled
            if not buf:
                return
            if profile_dir and not profiled:
                with trace(profile_dir):
                    losses = trainer.update_chunk([b for _, b in buf])
                profiled = True
                print(f"profiler trace written to {profile_dir}")
            else:
                losses = trainer.update_chunk([b for _, b in buf])
            sec = (time.time() - buf_t0) / len(buf)
            for (bi, bb), loss in zip(buf, losses):
                global_step += 1
                step_bookkeeping(bi, bb, loss, sec)
            buf = []

        for i, batch in enumerate(train_batcher):
            if epoch == start_epoch and i < skip_batches:
                continue  # consumed before the resume point
            if use_chunks:
                if buf and batch["words"].shape != buf[0][1]["words"].shape:
                    flush_buf()
                if not buf:
                    buf_t0 = time.time()
                buf.append((i, batch))
                cap = spd
                if cfg.train.save_steps:
                    cap = min(cap, cfg.train.save_steps
                              - global_step % cfg.train.save_steps)
                if len(buf) >= cap:
                    flush_buf()
                continue
            start = time.time()
            global_step += 1
            if profile_dir and not profiled and global_step == 3:
                # trace a few warm steps (skip compiles)
                with trace(profile_dir):
                    loss = trainer.update(batch)
                profiled = True
                print(f"profiler trace written to {profile_dir}")
            else:
                loss = trainer.update(batch)
            step_bookkeeping(i, batch, loss, time.time() - start)
        flush_buf()
        trainer.flush_gradients()
        # ONE fetch for the whole epoch's losses: float() per scalar would
        # pay a relay round trip each (measured ~20 ms/epoch-batch)
        from gcn_tpu.train.trainer import device_sum

        train_loss = (float(device_sum(epoch_losses))
                      if epoch_losses else 0.0)
        # the float() conversions above BLOCK on the epoch's last step, so
        # this wall-clock rate is fully executed work (the per-step log
        # lines only see the async enqueue rate)
        eps, xps, wall = meter.sustained()
        if epoch_losses:
            print(f"epoch {epoch} sustained: {eps:,.0f} edges/s, "
                  f"{xps:,.1f} ex/s over {wall:.2f}s wall")

        # deprel embedding snapshot (reference train.py:239-241)
        if is_chief:
            with open(os.path.join(run_dir, "deprel_embs.pkl"), "wb") as f:
                pickle.dump(
                    np.asarray(trainer.params["params"]["deprel_emb"]), f
                )

        print("Evaluating on train set...")
        train_labels, train_eval_loss, train_m = run_eval(train_eval_batcher)
        print(f"epoch {epoch}: train_loss = {train_loss:.6f}, "
              f"train_eval_loss = {train_eval_loss:.6f}, "
              f"train_f1 = {train_m['f1']:.4f}")

        if dev_batcher is not None:
            print("Evaluating on dev set...")
            dev_labels, dev_loss, dev_m = run_eval(dev_batcher)
            print(f"epoch {epoch}: dev_loss = {dev_loss:.6f}, "
                  f"dev_f1 = {dev_m['f1']:.4f}")
        else:
            # SemEval: select on train F1 (train_semeval.py:256-262)
            dev_labels, dev_loss, dev_m = train_labels, train_eval_loss, train_m

        selection_score = dev_m["f1"]
        if file_logger:
            file_logger.log(
                f"{epoch}\t{train_loss:.6f}\t{dev_loss:.6f}\t"
                f"{selection_score:.4f}\t"
                f"{max([selection_score] + selection_history):.4f}"
            )

        print("Evaluating on test set...")
        test_labels, _, test_m = run_eval(test_batcher)

        new_best = dev_m["f1"] > best_metrics["f1"]
        if new_best:
            best_metrics = dev_m
            test_at_best = test_m
            trainer.save(os.path.join(run_dir, "best_model"), epoch=epoch,
                         extra_meta={"best_metrics": best_metrics})
            print("new best model saved.")
            if file_logger:
                file_logger.log(
                    "new best model saved at epoch {}: {:.2f}\t{:.2f}\t{:.2f}"
                    .format(epoch, test_m["precision"] * 100,
                            test_m["recall"] * 100, test_m["f1"] * 100)
                )
            # confusion matrices + misclassified dumps (train.py:296-319,
            # written into the run dir by default; --test_save_dir /
            # --test_confusion_save_file redirect like the reference's
            # train.py:176-180)
            art_dir = run_dir
            if cfg.test_save_dir:
                art_dir = os.path.join(cfg.test_save_dir, cfg.id)
                os.makedirs(art_dir, exist_ok=True)
            for split, labels, batcher, ds in (
                ("test", test_labels, test_batcher, test_ds),
                ("dev", dev_labels, dev_batcher, dev_ds),
            ):
                if batcher is None or not is_chief:
                    continue
                gold = np.array(batcher.gold())
                pred = np.array(labels)
                cm = scorer.compute_confusion_matrices(gold, pred)
                cm_path = os.path.join(
                    art_dir, f"{split}_confusion_matrix.pkl")
                if split == "test" and cfg.test_confusion_save_file:
                    cm_path = cfg.test_confusion_save_file
                with open(cm_path, "wb") as f:
                    pickle.dump(cm, f)
                wrong = [
                    ds.raw_data[batcher.order[i]]
                    for i in np.nonzero(pred != gold)[0]
                ]
                import json as _json

                with open(os.path.join(
                        art_dir, f"{split}_incorrect_data.json"), "w") as f:
                    _json.dump(wrong, f)

        print("Best Dev Metrics | F1: {} | Precision: {} | Recall: {}".format(
            best_metrics["f1"], best_metrics["precision"],
            best_metrics["recall"]))
        print("Test Metrics at Best Dev | F1: {} | Precision: {} | "
              "Recall: {}".format(test_at_best["f1"],
                                  test_at_best["precision"],
                                  test_at_best["recall"]))

        # epoch checkpoint + retention (train.py:329-337)
        ckpt_dir = os.path.join(run_dir, f"checkpoint_epoch_{epoch}")
        trainer.save(ckpt_dir, epoch=epoch,
                     extra_meta={"best_metrics": best_metrics})
        if is_chief:
            from gcn_tpu.train import checkpoint as _ckpt

            _ckpt.wait_for_async_saves()
            prune_checkpoints(
                run_dir, epoch, cfg.train.save_epoch,
                keep_latest=cfg.train.keep_latest_checkpoints,
            )

        # plateau LR decay (train.py:340-343)
        if (
            len(selection_history) > cfg.train.decay_epoch
            and selection_score <= selection_history[-1]
            and cfg.train.optim in ("sgd", "adagrad", "adadelta")
        ):
            current_lr *= cfg.train.lr_decay
            trainer.update_lr(current_lr)

        selection_history.append(selection_score)
        print("")

    print(f"Training ended with {cfg.train.num_epoch} epochs.")
    return {
        "best_dev": best_metrics,
        "test_at_best_dev": test_at_best,
        "run_dir": run_dir,
    }
