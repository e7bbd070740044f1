"""Trainer: jitted update/predict with gradient accumulation, checkpoint IO.

Capability-parity with the reference ``GCNTrainer`` (``model/trainer.py``)
plus the driver-side optimization logic that lives in ``train.py:209-237``
(gradient accumulation to an effective batch, clip-then-step every
``update_gap`` batches, leftover flush).  Differences by design:

* the whole step (forward + backward + penalties) is one jitted program,
* accumulated gradients are summed on device (the reference sums them in the
  autograd buffers between ``optimizer.step()`` calls),
* checkpoints carry optimizer state (the reference drops it —
  ``model/trainer.py:40-49``).
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcn_tpu.config import Config
from gcn_tpu.models.gcn import GCNClassifier
from gcn_tpu.train import checkpoint as ckpt
from gcn_tpu.train.optim import build_optimizer, set_learning_rate


def _dummy_batch(cfg: Config, use_bert: bool = False) -> dict:
    b, n = 2, 16
    batch = {
        "pos": np.ones((b, n), np.int32),
        "deprel": np.ones((b, n), np.int32),
        "subj_mask": np.eye(b, n, dtype=bool),
        "obj_mask": np.eye(b, n, 2, dtype=bool),
        "pad_mask": np.zeros((b, n), bool),
        "lengths": np.full((b,), n, np.int32),
        "labels": np.zeros((b,), np.int32),
        "example_mask": np.ones((b,), bool),
        "edge_parent": np.zeros((b, n), np.int32),
        "edge_child": np.ones((b, n), np.int32),
        "edge_deprel": np.ones((b, n), np.int32),
        "edge_mask": np.ones((b, n), bool),
    }
    if use_bert:
        batch["words"] = np.zeros((b, n, cfg.model.emb_dim), np.float32)
    else:
        batch["words"] = np.ones((b, n), np.int32)
    if cfg.model.dataset == "tacred":
        batch["ner"] = np.ones((b, n), np.int32)
    return batch


# Measured v5e crossover for the row-sparse embedding update (see
# Trainer.__init__ / docs/design.md §7): dense wins at 150k rows, sparse
# wins at 500k; auto flips between them.
SPARSE_EMB_AUTO_VOCAB = 300_000


def allowed_chunk_sizes(cap: int) -> list[int]:
    """The dispatch sizes the chunked paths are allowed to compile:
    ``cap`` itself plus every power of two below it (descending).

    Each distinct ``lax.scan`` length is a separate XLA program (~1 min
    through the remote compile service at flagship shapes), and bucket-run
    remainders / save_steps cuts otherwise produce arbitrary lengths
    1..cap over a long run — an unbounded compile set.  Restricting to
    this set bounds it at log2(cap)+2 programs per batch shape and makes
    the whole set precompilable by ``Trainer.warmup``."""
    cap = max(1, int(cap))
    sizes = {cap} | {1 << j for j in range(cap.bit_length()) if (1 << j) <= cap}
    return sorted(sizes, reverse=True)


def chunk_plan(k: int, cap: int) -> list[int]:
    """Greedy decomposition of a k-batch run into allowed dispatch sizes
    (e.g. k=7, cap=8 -> [4, 2, 1]).  Step order is unchanged, so the
    decomposed dispatches are bit-identical to one k-length scan."""
    plan = []
    for s in allowed_chunk_sizes(cap):
        while k >= s:
            plan.append(s)
            k -= s
    return plan


@jax.jit
def _zeros_like_tree(t):
    # fresh device buffers for warmup calls into donating programs, so
    # the trainer's real params/opt_state are never donated away
    return jax.tree.map(jnp.zeros_like, t)


def _warmup_workers(requested: int) -> int:
    """Thread-pool width for ``Trainer.warmup`` compiles.

    Concurrent jit dispatch is only worthwhile (and only known-safe) when
    compilation happens SERVICE-side — the remote TPU relay, where each
    compile RPC releases the GIL and the service compiles in parallel.  On
    any IN-PROCESS PJRT backend (CPU, a directly-attached TPU/GPU) the
    compiles run inside this interpreter, and two threads concurrently
    inside MLIR lowering + the persistent compilation cache have
    segfaulted it (observed SIGSEGV: one thread in
    ``compilation_cache.get_executable_and_time``, another mid-lowering);
    there is no overlap win in-process anyway.  So the pool is opt-in:
    only when the backend identifies as the remote relay (its
    ``platform_version`` carries the relay signature), default inline
    everywhere else.
    """
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ""
    if "axon" not in version:
        return 1
    return max(1, int(requested))


@jax.jit
def device_weighted_sum(scalars: list, weights: jax.Array) -> jax.Array:
    """Dot of a list of device scalars with a host weight vector in one
    program + one fetch (see ``device_sum`` for why module-level)."""
    return jnp.dot(jnp.stack(scalars), weights)


@jax.jit
def device_sum(scalars: list) -> jax.Array:
    """Sum a list of device scalars in one program + one fetch.  Module-
    level so the trace caches across calls (a fresh ``jax.jit(lambda…)``
    per call re-compiles every time — ~0.4 s/epoch over the relay)."""
    return sum(scalars[1:], scalars[0])


def conv_l2_penalty(params: dict, adj_type: str) -> jax.Array:
    """Σ‖W‖² over GCN layer transform weights (reference ``conv_l2``,
    ``model/gcn.py:180-184``: weight + bias of every ModuleList ``W``).

    Per-mode scope (golden-tested: ``tests/goldens/train_regular_l2.npz``):

    * ``regular`` / ``attention``: the ``gcn_w{l}`` kernels+biases —
      exactly the reference's ModuleList ``W`` (kernel is the transposed
      ``W.weight``; identical squared sum).  The attention mode's extra
      q/k projections are NOT penalized (they are not conv transforms).
    * ``full_deprel``: the ``gcn_deprel_w{l}/b{l}`` bilinear transforms.
      This is DEFINED EXTENSION territory: the reference crashes here
      (its ``self.W`` is a single ``nn.Linear`` and ``conv_l2`` iterates
      it — TypeError, ``model/gcn.py:166-167`` vs ``:180-184``).
    * ``diagonal_deprel``: zero — the mode has no conv transform weights
      (the reference also crashes: no ``self.W`` at all).

    The prefixes are disjoint per mode (regular creates only ``gcn_w*``,
    full_deprel only ``gcn_deprel_*``), so matching both is exact."""
    total = jnp.zeros(())
    for name, value in params["params"].items():
        if name.startswith("gcn_w") or name.startswith("gcn_deprel_"):
            leaves = (
                value.values() if isinstance(value, dict) else [value]
            )
            for leaf in leaves:
                total = total + jnp.sum(jnp.square(leaf))
    return total


class Trainer:
    """Holds (model, params, opt_state) and drives jitted steps."""

    def __init__(
        self,
        cfg: Config,
        emb_matrix: Optional[np.ndarray] = None,
        rng_seed: Optional[int] = None,
        init_batch: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.model = GCNClassifier(cfg.model)
        # set by DistributedTrainer: activates shard-local grouping for the
        # factored full_deprel path inside the jitted steps (trace-time)
        self._grouping_mesh = None
        from gcn_tpu.utils.rng import configure_prng

        configure_prng(cfg.train.prng_impl)
        seed = cfg.train.seed if rng_seed is None else rng_seed
        key = jax.random.key(seed)
        key, p_key, d_key, self._key = jax.random.split(key, 4)
        batch = init_batch or _dummy_batch(
            cfg, use_bert=cfg.model.use_bert_embeddings
        )
        # jit the initializer: eager init dispatches each op separately,
        # which is pathologically slow over a remote TPU tunnel
        self.params = jax.jit(
            lambda rngs, b: self.model.init(rngs, b, True)
        )({"params": p_key, "dropout": d_key}, batch)
        if emb_matrix is not None:
            assert emb_matrix.shape == self.params["params"]["word_emb"].shape, (
                f"embedding matrix {emb_matrix.shape} vs vocab "
                f"{self.params['params']['word_emb'].shape}"
            )
            self.params = jax.tree.map(lambda x: x, self.params)  # copy tree
            self.params["params"]["word_emb"] = jnp.asarray(
                emb_matrix, jnp.float32
            )
        # row-sparse embedding updates (train.sparse_emb): the fused/chunk
        # steps update only the vocab rows the batch touches.  "auto" = on
        # for the supported row-local optimizers on the single-device
        # fused path when the table is large enough to win: XLA's TPU
        # scatter costs ~70 ns/row regardless of update size, so the
        # measured v5e crossover vs the dense update is between 150k rows
        # (dense 5.8 vs sparse 7.5 ms/step) and 500k rows (dense 12.5 vs
        # sparse 9.0) — auto switches at 300k.  DistributedTrainer turns
        # auto off (the scatter onto a vocab-sharded table is not
        # profiled) — "true"/"false" force either path.
        from gcn_tpu.train import sparse_emb as _sparse

        mode = str(cfg.train.sparse_emb_grad).lower()
        eligible = (
            _sparse.supported(cfg.train.optim)
            and not cfg.model.use_bert_embeddings
            and cfg.train.update_gap <= 1
        )
        if mode == "true":
            if not eligible:
                raise ValueError(
                    "--sparse_emb_grad true requires a row-local optimizer "
                    "(sgd/adagrad), integer word inputs (not BERT) and "
                    "update_gap == 1; got "
                    f"optim={cfg.train.optim}, "
                    f"bert={cfg.model.use_bert_embeddings}, "
                    f"update_gap={cfg.train.update_gap}"
                )
            self._sparse_emb = True
        elif mode == "auto":
            self._sparse_emb = (
                eligible and cfg.model.vocab_size >= SPARSE_EMB_AUTO_VOCAB
            )
        else:
            self._sparse_emb = False
        self.tx = build_optimizer(
            cfg.train.optim,
            cfg.train.lr,
            max_grad_norm=cfg.train.max_grad_norm,
            topn=cfg.model.topn,
            external_clip=self._sparse_emb,
        )
        self.opt_state = self.tx.init(self.params)
        self.current_lr = cfg.train.lr
        self._accum = None
        self._accum_count = 0
        self.global_step = 0
        # single-buffer host->device batch transfer (data.packing): one
        # int32 array instead of 13 leaves, each of which pays a network
        # round trip on a tunneled TPU.  DistributedTrainer places the
        # packed buffer sharded over the data axis (one scatter instead of
        # 13 per-leaf placements).
        self._pack = (cfg.train.pack_transfers
                      and not cfg.model.use_bert_embeddings)
        # graph-parallel aggregation (cfg.model.graph_partition): the mesh
        # is set by DistributedTrainer; the jitted steps activate the
        # trace-time context so the model routes its aggregation through
        # parallel.edge_partition / parallel.halo
        self._partition_mesh = None
        # (halo-mode batches carry hplan_* side-band arrays; the strict
        # exact-key check in data.packing.packable rejects those, so no
        # blanket opt-out is needed — a run where halo is configured but
        # inactive, e.g. model axis 1, keeps the single-buffer transfer)

    def _set_sparse_emb(self, flag: bool) -> None:
        """Flip the row-sparse embedding mode BEFORE any step has traced
        (rebuilds the optimizer chain; the state pytree is identical)."""
        if flag == self._sparse_emb:
            return
        self._sparse_emb = flag
        self.tx = build_optimizer(
            self.cfg.train.optim,
            self.cfg.train.lr,
            max_grad_norm=self.cfg.train.max_grad_norm,
            topn=self.cfg.model.topn,
            external_clip=flag,
        )

    # ------------------------------------------------------------ jit steps
    def _loss(self, params, batch, key, step):
        """Training loss (CE over valid rows + conv/pooling L2 penalties,
        reference ``model/trainer.py:94-100``).  Traced inside the jitted
        steps below.

        The dropout stream is ``fold_in(base_key, global_step)`` computed
        IN-PROGRAM: a host-side ``jax.random.split`` per step would be an
        eager dispatch (expensive over the TPU relay), and deriving from
        the step counter makes the stream reproducible across ``--resume``
        (a split chain restarts wherever the restored process left it)."""
        from gcn_tpu.utils.shard_ctx import graph_partition, local_grouping

        step_key = jax.random.fold_in(key, step)
        with local_grouping(self._grouping_mesh), graph_partition(
                self.cfg.model.graph_partition, self._partition_mesh):
            logits, pooled = self.model.apply(
                params, batch, False, rngs={"dropout": step_key}
            )
        # CE in fp32 always: on bf16 logits the rounding error is ~1e-2
        # per example and the logged loss can even go negative
        logits = logits.astype(jnp.float32)
        em = batch["example_mask"].astype(jnp.float32)
        denom = jnp.maximum(em.sum(), 1.0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]
        )
        loss = (ce * em).sum() / denom
        if self.cfg.train.conv_l2 > 0:
            loss = loss + self.cfg.train.conv_l2 * conv_l2_penalty(
                params, self.cfg.model.adj_type
            )
        if self.cfg.train.pooling_l2 > 0:
            pooled = pooled.astype(jnp.float32)
            pen = (jnp.square(pooled).sum(1) * em).sum() / denom
            loss = loss + self.cfg.train.pooling_l2 * pen
        return loss

    def _unpack(self, packed):
        """Inverse of ``data.packing.pack_batch`` — traced inside the
        packed jit wrappers below, so one int32 buffer crosses host→device
        instead of 13 leaves (each leaf transfer pays a network round trip
        on the tunneled TPU: measured ~4.3 ms/batch blocked, pure RTT —
        the whole batch is ~200 KB)."""
        from gcn_tpu.data.packing import unpack_batch

        return unpack_batch(packed, self.cfg.model.dataset == "tacred")

    @partial(jax.jit, static_argnums=0)
    def _loss_and_grads(self, params, batch, key, step):
        return jax.value_and_grad(
            lambda p: self._loss(p, batch, key, step)
        )(params)

    @partial(jax.jit, static_argnums=0)
    def _loss_and_grads_packed(self, params, packed, key, step):
        batch = self._unpack(packed)
        return jax.value_and_grad(
            lambda p: self._loss(p, batch, key, step)
        )(params)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1,))
    def _accum_add(self, acc, grads):
        # one jitted program instead of per-leaf eager adds (eager dispatch
        # over the remote TPU relay costs seconds per op)
        return jax.tree.map(jnp.add, acc, grads)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _apply_grads(self, params, opt_state, grads):
        # donated params/opt_state update in place on device (no fresh
        # allocation per step); callers always rebind to the results
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _step_core(self, params, opt_state, batch, key, step):
        """One optimizer step (grad + clip + update), traced inside the
        fused/chunked programs below.  With ``_sparse_emb`` active the
        word-embedding rows are gathered OUTSIDE the differentiated
        closure and only the touched rows are updated
        (``train.sparse_emb`` — O(B·N·E) instead of O(V·E) table
        traffic, numerically equivalent)."""
        if self._sparse_emb:
            from gcn_tpu.train import sparse_emb

            emb = params["params"]["word_emb"]
            rows = jnp.take(emb, batch["words"], axis=0)
            loss, (g_full, g_rows) = jax.value_and_grad(
                lambda p, r: self._loss(
                    p, dict(batch, word_vecs=r), key, step
                ),
                argnums=(0, 1),
            )(params, rows)
            params, opt_state = sparse_emb.sparse_step(
                self.tx, params, opt_state, g_full, batch["words"], g_rows,
                optim=self.cfg.train.optim,
                topn=self.cfg.model.topn,
                max_grad_norm=self.cfg.train.max_grad_norm,
            )
            return params, opt_state, loss
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(p, batch, key, step)
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _fused_step(self, params, opt_state, batch, key, step):
        """grad + clip + optimizer update as ONE program — used when
        ``update_gap == 1`` (the flagship TACRED config): one dispatch per
        step instead of two, and the gradient tree never round-trips HBM
        between programs.  Accumulating configs keep the two-program path
        (the accumulation buffer lives between dispatches by design)."""
        return self._step_core(params, opt_state, batch, key, step)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _fused_step_packed(self, params, opt_state, packed, key, step):
        return self._step_core(
            params, opt_state, self._unpack(packed), key, step
        )

    # --- sentence-packed (PackedBatcher) wire format: [B,S,N] slot masks
    # and [B·S] labels don't fit the plain packers, so these twins carry
    # the static (n, s) geometry for data.packing.unpack_sentence_batch.
    def _unpack_sp(self, packed, n: int, s: int):
        from gcn_tpu.data.packing import unpack_sentence_batch

        return unpack_sentence_batch(
            packed, n, s, self.cfg.model.dataset == "tacred"
        )

    @partial(jax.jit, static_argnums=(0, 6, 7), donate_argnums=(1, 2))
    def _fused_step_spacked(self, params, opt_state, packed, key, step,
                            n, s):
        return self._step_core(
            params, opt_state, self._unpack_sp(packed, n, s), key, step
        )

    @partial(jax.jit, static_argnums=(0, 5, 6))
    def _loss_and_grads_spacked(self, params, packed, key, step, n, s):
        batch = self._unpack_sp(packed, n, s)
        return jax.value_and_grad(
            lambda p: self._loss(p, batch, key, step)
        )(params)

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _forward_eval_spacked(self, params, packed, n, s):
        return self._eval_core(params, self._unpack_sp(packed, n, s))

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _chunk_step(self, params, opt_state, stack, key, step0):
        """k fused optimizer steps as ONE program: ``lax.scan`` over a
        [k, B, C] stack of packed batches.  One dispatch + one transfer
        round trip per k steps instead of per step — the driver's
        ``steps_per_dispatch`` mode.  Per-step dropout streams are
        fold_in(key, step0 + i), identical to the per-batch path, so the
        two paths produce bit-identical parameters."""

        def body(carry, xs):
            params, opt_state = carry
            packed, step = xs
            params, opt_state, loss = self._step_core(
                params, opt_state, self._unpack(packed), key, step
            )
            return (params, opt_state), loss

        steps = step0 + jnp.arange(stack.shape[0], dtype=jnp.int32)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (stack, steps)
        )
        return params, opt_state, losses

    def update_chunk(self, batches: list) -> list:
        """Run ``len(batches)`` optimizer steps in one dispatch (all
        batches must share shapes — the driver groups by length bucket).
        Returns per-step device losses.  Requires ``update_gap == 1``;
        falls back to per-batch ``update`` otherwise or when packing
        does not apply."""
        if (len(batches) < 2 or self.cfg.train.update_gap > 1
                or self._accum is not None
                or not all(self._can_pack(b) for b in batches)
                or len({b["words"].shape for b in batches}) != 1):
            return [self.update(b) for b in batches]
        # dispatch in allowed_chunk_sizes pieces (7 -> 4+2+1): bounded,
        # precompilable program set; bit-identical to one 7-length scan
        # (the per-step fold_in streams depend only on global_step)
        losses: list = []
        i = 0
        spd = int(self.cfg.train.steps_per_dispatch)
        # driver calls carry spd as the cap; a direct caller with spd <= 1
        # asked for exactly this chunk — honor it as one scan
        cap = spd if spd > 1 else len(batches)
        for size in chunk_plan(len(batches), cap):
            sub = batches[i:i + size]
            i += size
            if size == 1:
                losses.append(self.update(sub[0]))
                continue
            stack = self._place_stack(
                np.stack([self._pack_host(b) for b in sub])
            )
            step0 = np.int32(self.global_step)
            self.global_step += size
            self.params, self.opt_state, ls = self._chunk_step(
                self.params, self.opt_state, stack, self._key, step0
            )
            losses.extend(list(ls))
        return losses

    def _eval_core(self, params, batch):
        from gcn_tpu.utils.shard_ctx import graph_partition, local_grouping

        with local_grouping(self._grouping_mesh), graph_partition(
                self.cfg.model.graph_partition, self._partition_mesh):
            logits, _ = self.model.apply(params, batch, True)
        logits = logits.astype(jnp.float32)  # fp32 CE/softmax always
        em = batch["example_mask"].astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]
        )
        loss = (ce * em).sum() / jnp.maximum(em.sum(), 1.0)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs, loss

    @partial(jax.jit, static_argnums=0)
    def _forward_eval(self, params, batch):
        return self._eval_core(params, batch)

    @partial(jax.jit, static_argnums=0)
    def _forward_eval_packed(self, params, packed):
        return self._eval_core(params, self._unpack(packed))

    @partial(jax.jit, static_argnums=0)
    def _forward_eval_chunk(self, params, stack):
        """Eval forwards over a [k, B, C] packed stack in ONE program —
        one transfer + one dispatch per k batches (``steps_per_dispatch``
        applies to evaluation too)."""

        def body(_, packed):
            return None, self._eval_core(params, self._unpack(packed))

        _, (probs, losses) = jax.lax.scan(body, None, stack)
        return probs, losses

    # -------------------------------------------------------------- updates
    def _can_pack(self, batch: dict) -> bool:
        """Single eligibility gate for the packed/chunked paths.  The mesh
        trainer also requires the batch axis to divide the data axis."""
        from gcn_tpu.data.packing import packable

        return self._pack and packable(batch)

    def _pack_host(self, batch: dict):
        """Host-side packing in the configured wire format
        (``train.pack_format``: compact uint8 vs legacy int32)."""
        from gcn_tpu.data.packing import pack_batch, pack_batch_compact

        if self.cfg.train.pack_format == "compact":
            return pack_batch_compact(batch)
        return pack_batch(batch)

    def _maybe_pack(self, batch: dict):
        """(packed_or_none) — pack eligible host batches into one buffer
        and START its host->device transfer (``device_put`` is async, so
        the copy overlaps the jit dispatch and earlier steps' compute
        instead of running inside the dispatch critical path).
        ``DistributedTrainer`` overrides this to place the packed buffer
        sharded over the data axis."""
        if not self._can_pack(batch):
            return None
        return jax.device_put(self._pack_host(batch))

    def _can_pack_sentence(self, batch: dict) -> bool:
        from gcn_tpu.data.packing import sentence_packable

        return self._pack and sentence_packable(batch)

    def _maybe_pack_sentence(self, batch: dict):
        """(buf, n, s) for a PackedBatcher batch, or None.  The mesh
        trainers opt out (their leaf placement already runs device-side;
        the wire format is a host->device transfer optimization)."""
        if not self._can_pack_sentence(batch):
            return None
        from gcn_tpu.data.packing import pack_sentence_batch

        n = batch["words"].shape[1]
        s = batch["slot_mask"].shape[1]
        return jax.device_put(pack_sentence_batch(batch)), n, s

    def _place_stack(self, stack):
        """Placement hook for [k, B, C] packed stacks (chunk dispatch);
        the mesh trainer shards the batch axis over ``data``."""
        return jax.device_put(stack)

    def _place_raw(self, batch: dict) -> dict:
        """Placement hook for UNPACKED batch dicts.  Identity here; the
        mesh trainer commits every leaf to its sharding — warmup must
        compile against the same input shardings the real step will see
        (jit keys on them; a default-sharded warmup executable would
        never be reused and the first real step would recompile cold)."""
        return batch

    def update(self, batch: dict):
        """Forward+backward; steps the optimizer every ``update_gap``
        accumulated batches (reference ``train.py:209-227``)."""
        step = np.int32(self.global_step)  # dynamic scalar: no retrace
        self.global_step += 1
        packed = self._maybe_pack(batch)
        sp = None if packed is not None else self._maybe_pack_sentence(batch)
        if self.cfg.train.update_gap <= 1 and self._accum is None:
            # every batch is an optimizer step: one fused program
            if packed is not None:
                self.params, self.opt_state, loss = self._fused_step_packed(
                    self.params, self.opt_state, packed, self._key, step
                )
            elif sp is not None:
                buf, n, s = sp
                self.params, self.opt_state, loss = self._fused_step_spacked(
                    self.params, self.opt_state, buf, self._key, step, n, s
                )
            else:
                self.params, self.opt_state, loss = self._fused_step(
                    self.params, self.opt_state, batch, self._key, step
                )
            return loss
        if packed is not None:
            loss, grads = self._loss_and_grads_packed(
                self.params, packed, self._key, step
            )
        elif sp is not None:
            buf, n, s = sp
            loss, grads = self._loss_and_grads_spacked(
                self.params, buf, self._key, step, n, s
            )
        else:
            loss, grads = self._loss_and_grads(self.params, batch,
                                               self._key, step)
        if self._accum is None:
            self._accum = grads
        else:
            self._accum = self._accum_add(self._accum, grads)
        self._accum_count += 1
        if self._accum_count >= self.cfg.train.update_gap:
            self.flush_gradients()
        # return the DEVICE scalar: converting to float here would block on
        # a device round-trip every step (expensive over a remote tunnel);
        # callers convert at log/epoch boundaries
        return loss

    def flush_gradients(self) -> None:
        """Apply any pending accumulated gradients
        (reference ``train.py:235-237`` end-of-epoch flush)."""
        if self._accum is None or self._accum_count == 0:
            return
        self.params, self.opt_state = self._apply_grads(
            self.params, self.opt_state, self._accum
        )
        self._accum = None
        self._accum_count = 0

    def _eval_forward(self, batch: dict):
        packed = self._maybe_pack(batch)
        if packed is not None:
            return self._forward_eval_packed(self.params, packed)
        sp = self._maybe_pack_sentence(batch)
        if sp is not None:
            buf, n, s = sp
            return self._forward_eval_spacked(self.params, buf, n, s)
        return self._forward_eval(self.params, batch)

    def predict_batch(self, batch: dict):
        """Eval-mode predictions for the VALID rows of one padded batch.
        Returns (predictions list[int], probs list[list[float]], loss)."""
        probs, loss = self._eval_forward(batch)
        probs = np.asarray(probs)
        mask = np.asarray(batch["example_mask"])
        preds = probs.argmax(axis=1)
        return (
            preds[mask].tolist(),
            probs[mask].tolist(),
            float(loss),
        )

    def evaluate(self, batches: Iterable[dict]):
        """Predict over an iterable of batches → (preds, probs, avg_loss)
        where avg_loss follows the reference normalization
        (Σ batch_loss / num_examples × batch_size, ``train.py:252``).

        Forward passes are enqueued ahead of the host pulls with a bounded
        window (depth 8): latency is still pipelined away, but device queue
        depth — and therefore live device memory for eval outputs — stays
        O(window) instead of O(dataset) at TACRED scale.
        """
        window = 8
        pending: list[tuple] = []
        all_preds: list[int] = []
        all_probs: list[list[float]] = []
        losses: list = []  # device scalars; ONE fetch at the end
        loss_w: list[int] = []  # per-entry valid-example counts (host)
        n = 0
        self._saw_packed_eval = False
        # eval_batch_size != batch_size: the reference's Σmean/n×bs
        # bookkeeping (train.py:252) only reproduces the per-example mean
        # when eval batches carry exactly batch_size rows — use the exact
        # weighted mean then (same value on full same-size batches)
        saw_offsize = False

        def drain(item):
            nonlocal n, saw_offsize
            probs, loss, mask = item
            probs = np.asarray(probs)
            preds = probs.argmax(axis=1)
            all_preds.extend(preds[mask].tolist())
            all_probs.extend(probs[mask].tolist())
            losses.append(loss)
            loss_w.append(int(mask.sum()))
            n += int(mask.sum())
            saw_offsize |= probs.shape[0] != self.cfg.train.batch_size

        spd = max(1, self.cfg.train.steps_per_dispatch)
        if spd > 1 and self._pack:
            # chunked: one transfer + one program per spd batches; each
            # pending item carries a whole chunk's results
            buf: list[dict] = []

            def drain_chunk(chunk):
                cprobs, closses, masks = chunk
                # ONE fetch for the whole chunk's probs ([k,B,C]) — a
                # per-batch np.asarray would pay a round trip per batch
                cprobs = np.asarray(cprobs)
                for p, l, m in zip(cprobs, closses, masks):
                    drain((p, l, m))

            def flush():
                if not buf:
                    return
                # allowed_chunk_sizes dispatches (see update_chunk): the
                # eval scan programs stay a bounded, precompilable set
                i = 0
                for size in chunk_plan(len(buf), spd):
                    sub = buf[i:i + size]
                    i += size
                    masks = [np.asarray(b["example_mask"]) for b in sub]
                    if size == 1:
                        probs, loss = self._eval_forward(sub[0])
                        pending.append((probs[None], [loss], masks))
                        continue
                    stack = self._place_stack(
                        np.stack([self._pack_host(b) for b in sub])
                    )
                    # NB: do not name this `losses` — it would shadow the
                    # outer accumulator that drain() appends to
                    cprobs, closs = self._forward_eval_chunk(
                        self.params, stack
                    )
                    pending.append((cprobs, list(closs), masks))
                buf.clear()
                # flush() can append SEVERAL pending chunks (chunk_plan
                # decomposition of a remainder buffer) — drain until the
                # live device-output queue is back under its O(window)
                # bound, not just one pop
                while len(pending) >= max(window // spd, 2):
                    drain_chunk(pending.pop(0))

            for batch in batches:
                self._saw_packed_eval |= "slot_mask" in batch
                if not self._can_pack(batch):
                    flush()
                    probs, loss = self._eval_forward(batch)
                    pending.append(
                        (probs[None], [loss],
                         [np.asarray(batch["example_mask"])])
                    )
                    continue
                if buf and batch["words"].shape != buf[0]["words"].shape:
                    flush()
                buf.append(batch)
                if len(buf) >= spd:
                    flush()
            flush()
            for chunk in pending:
                drain_chunk(chunk)
        else:
            for batch in batches:
                self._saw_packed_eval |= "slot_mask" in batch
                probs, loss = self._eval_forward(batch)
                pending.append(
                    (probs, loss, np.asarray(batch["example_mask"]))
                )
                if len(pending) >= window:
                    drain(pending.pop(0))
            for item in pending:
                drain(item)
        if self._saw_packed_eval or saw_offsize:
            # sentence-packed batchers: cfg batch_size counts ROWS, so
            # the reference formula below would deflate the logged loss
            # by the pack factor; instead report the exact per-example
            # mean — each batch's mean loss weighted by its valid-example
            # count, so a partially filled final batch contributes in
            # proportion (still ONE device program + fetch)
            total = (float(device_weighted_sum(
                losses, np.asarray(loss_w, np.float32)))
                if losses else 0.0)
            avg = total / max(n, 1)
        else:
            total_loss = float(device_sum(losses)) if losses else 0.0
            avg = total_loss / max(n, 1) * self.cfg.train.batch_size
        return all_preds, all_probs, avg

    # -------------------------------------------------------------- warmup
    def warmup(self, batches: Iterable[dict], *, include_eval: bool = True,
               max_workers: int = 4,
               eval_batches: Iterable[dict] | None = None) -> dict:
        """Pre-compile every program the train/eval loops will need, with
        the compiles running in parallel threads.

        Each distinct batch shape × dispatch size is a separate XLA
        program; through the remote TPU compile service the flagship
        ``steps_per_dispatch=8`` scan costs ~1 min to compile, so a cold
        multi-bucket run pays minutes of serial compiles spread over its
        first epoch.  Compile RPCs release the GIL, so issuing them from a
        thread pool overlaps service-side compilation (measured on the
        relay: 2 programs 3.3 s sequential -> 2.5 s threaded; the win
        grows with program cost).  ``batches`` should hold one
        representative batch per distinct shape (``Batcher.warmup_batches``)
        — duplicates are deduped here.

        Only the shapes matter: dummy zero params/opt_state are used for
        the donating programs, and results are discarded, so trainer state
        (params, opt_state, global_step, RNG stream) is untouched and a
        warmed run stays bit-identical to an un-warmed one.

        ``eval_batches`` carries representatives that only ever occur in
        EVALUATION (dev/test/train-eval batcher shapes): those compile
        only the eval programs — compiling full training programs (~1
        min/program at flagship shapes through the remote compile
        service) for shapes the train loop never sees would cost more
        than warmup saves.  With ``eval_batches=None`` (legacy), every
        rep compiles both sets when ``include_eval``.

        Call only from a single-process runtime: with ``jax.process_count()
        > 1`` thread-pool completion order would differ across processes
        and deadlock the SPMD executions.  Returns ``{"programs", "seconds"}``.
        """
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        def sig_of(b: dict):
            # the FULL batch signature: today every leaf's shape derives
            # from (pad_b, n), but that invariant is implicit — keying on
            # all leaves is cheap and survives a future independently-
            # padded leaf (e.g. the halo plan arrays)
            return tuple(sorted(
                (k, np.shape(v), np.asarray(v).dtype.str)
                for k, v in b.items()
            ))

        legacy = eval_batches is None
        reps: dict = {}
        for b in batches:
            ent = reps.setdefault(
                sig_of(b), {"batch": b, "train": False, "eval": False}
            )
            ent["train"] = True
            ent["eval"] = ent["eval"] or (legacy and include_eval)
        for b in (eval_batches or ()):
            ent = reps.setdefault(
                sig_of(b), {"batch": b, "train": False, "eval": False}
            )
            ent["eval"] = include_eval

        key, step = self._key, np.int32(0)
        cap = max(1, int(self.cfg.train.steps_per_dispatch))
        fused = self.cfg.train.update_gap <= 1
        chunked = cap > 1 and fused
        # evaluate() dispatches _forward_eval_chunk whenever spd > 1 and
        # packing applies, REGARDLESS of update_gap — gate eval scans on
        # cap alone (a fused-only gate left them to compile cold at the
        # first eval when effective_batch_size > batch_size)
        chunked_eval = cap > 1
        scan_sizes = [s for s in allowed_chunk_sizes(cap) if s > 1]

        tasks = []
        for ent in reps.values():
            b = ent["batch"]
            packed = self._maybe_pack(b)
            sp = None if packed is not None else self._maybe_pack_sentence(b)
            if ent["train"]:
                if fused:
                    if packed is not None:
                        tasks.append(
                            lambda p=packed: self._fused_step_packed(
                                _zeros_like_tree(self.params),
                                _zeros_like_tree(self.opt_state),
                                p, key, step))
                    elif sp is not None:
                        tasks.append(
                            lambda t=sp: self._fused_step_spacked(
                                _zeros_like_tree(self.params),
                                _zeros_like_tree(self.opt_state),
                                t[0], key, step, t[1], t[2]))
                    else:
                        tasks.append(
                            lambda bb=self._place_raw(b): self._fused_step(
                                _zeros_like_tree(self.params),
                                _zeros_like_tree(self.opt_state), bb, key,
                                step))
                elif packed is not None:
                    tasks.append(
                        lambda p=packed: self._loss_and_grads_packed(
                            self.params, p, key, step))
                elif sp is not None:
                    tasks.append(
                        lambda t=sp: self._loss_and_grads_spacked(
                            self.params, t[0], key, step, t[1], t[2]))
                else:
                    tasks.append(
                        lambda bb=self._place_raw(b): self._loss_and_grads(
                            self.params, bb, key, step))
                if chunked and packed is not None:
                    for s in scan_sizes:
                        stack = np.stack([np.asarray(packed)] * s)
                        tasks.append(lambda st=stack: self._chunk_step(
                            _zeros_like_tree(self.params),
                            _zeros_like_tree(self.opt_state),
                            self._place_stack(st), key, step))
            if ent["eval"]:
                if packed is not None:
                    tasks.append(lambda p=packed: self._forward_eval_packed(
                        self.params, p))
                    if chunked_eval:
                        for s in scan_sizes:
                            stack = np.stack([np.asarray(packed)] * s)
                            tasks.append(
                                lambda st=stack: self._forward_eval_chunk(
                                    self.params, self._place_stack(st)))
                elif sp is not None:
                    tasks.append(lambda t=sp: self._forward_eval_spacked(
                        self.params, t[0], t[1], t[2]))
                else:
                    tasks.append(
                        lambda bb=self._place_raw(b): self._forward_eval(
                            self.params, bb))
        if not fused:
            # the accumulation path's shape-independent programs
            tasks.append(lambda: self._accum_add(
                _zeros_like_tree(self.params), self.params))
            tasks.append(lambda: self._apply_grads(
                _zeros_like_tree(self.params),
                _zeros_like_tree(self.opt_state),
                _zeros_like_tree(self.params)))

        max_workers = _warmup_workers(max_workers)
        t0 = _time.time()
        if max_workers <= 1:
            # CPU backend: run compiles INLINE on the main thread — even a
            # single pool worker segfaults (observed: SIGSEGV with the
            # worker inside compilation_cache.get_executable_and_time
            # while the main thread merely waits on the future; the
            # persistent-cache executable deserialization is not safe off
            # the main thread there)
            for t in tasks:
                jax.block_until_ready(t())
        else:
            with ThreadPoolExecutor(max_workers=max_workers) as ex:
                for fut in [ex.submit(t) for t in tasks]:
                    jax.block_until_ready(fut.result())
        return {"programs": len(tasks), "seconds": _time.time() - t0}

    # ------------------------------------------------------------------- lr
    def update_lr(self, new_lr: float) -> None:
        self.opt_state = set_learning_rate(self.opt_state, new_lr)
        self.current_lr = new_lr

    # ------------------------------------------------------------------- IO
    def save(self, directory: str, epoch: Optional[int] = None,
             extra_meta: Optional[dict] = None) -> None:
        meta = {"epoch": epoch, "global_step": self.global_step,
                "current_lr": self.current_lr}
        if extra_meta:
            meta.update(extra_meta)
        ckpt.save_checkpoint(
            directory,
            self.params,
            self.opt_state,
            config=self.cfg.to_dict(),
            meta=meta,
            async_save=self.cfg.train.async_save,
        )

    def load(self, directory: str, load_opt_state: bool = True) -> dict:
        ckpt.wait_for_async_saves()
        params, opt_state, blob = ckpt.load_checkpoint(
            directory, self.params,
            self.opt_state if load_opt_state else None,
        )
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state
        meta = blob.get("meta", {})
        if meta.get("current_lr") is not None:
            self.update_lr(float(meta["current_lr"]))
        # restore the step counter: the jitted steps derive the dropout
        # stream as fold_in(base_key, global_step), so a resumed run only
        # reproduces the original stream if the counter continues
        if meta.get("global_step") is not None:
            self.global_step = int(meta["global_step"])
        return meta
