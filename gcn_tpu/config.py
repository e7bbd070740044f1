"""Typed configuration for the TPU-native tree-GCN framework.

Replaces the reference's argparse→mutable-dict "opt" soup
(``/root/reference/train.py:49-132``).  Every flag of the reference drivers is
a field here (same names, same defaults where they are sane), plus
TPU-specific fields (dtype policy, length buckets, mesh shape).

Differences from the reference (deliberate — see SURVEY.md §7 "quirks"):

* ``prune_k`` defaults to ``1`` — the reference default ``-1`` crashes its own
  ``tree_to_adj`` (reference ``model/tree.py:70-79`` vs ``:194``); we support
  ``-1`` (no pruning) properly.
* ``full_deprel`` supports per-layer weights (``deprel_shared_w=False``) so
  stacked layers work when ``in_dim != hidden_dim``; the reference's single
  shared weight (``model/gcn.py:164-167``) crashes in that case.  Setting
  ``deprel_shared_w=True`` reproduces the reference's parameterization for
  parity when dimensions allow.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class ModelConfig:
    """Architecture hyper-parameters (reference ``train.py:53-119``)."""

    # embeddings
    emb_dim: int = 300
    ner_dim: int = 30
    pos_dim: int = 30
    vocab_size: int = 0           # filled from vocab at build time
    topn: int = int(1e10)         # finetune only top-N word embedding rows
    emb_dropout: float = 0.0      # type-level embedding dropout

    # encoder
    hidden_dim: int = 200
    num_layers: int = 2
    input_dropout: float = 0.5
    gcn_dropout: float = 0.5

    # BiLSTM front-end ("C-GCN")
    rnn: bool = True
    rnn_hidden: int = 200
    rnn_layers: int = 1
    rnn_dropout: float = 0.5
    rnn_unroll: int = 8           # lax.scan unroll factor for the BiLSTM
                                  # (8 measured fastest on v5e: 1.23x the
                                  # rolled scan at B=50/N=96, tools/
                                  # step_breakdown.py; parity-tested)
    rnn_impl: str = "auto"        # auto | scan | pallas; auto = persistent
                                  # Pallas kernel on TPU (measured 1.5-3.9x
                                  # the scan fwd+bwd), lax.scan elsewhere

    # graph / aggregation
    prune_k: int = 1
    adj_type: str = "regular"     # regular | diagonal_deprel | full_deprel
    deprel_emb_dim: int = 200
    deprel_dropout: float = 0.5
    deprel_self_loop: bool = True
    deprel_directed: bool = False
    deprel_alpha: float = 1.0
    edge_keep_prob: float = 1.0   # probability an edge survives edge-dropout
    deprel_keep_prop: float = 1.0 # probability a deprel emb is NOT forgotten
    deprel_max_depth: int = 2     # layers >= this use all-ones deprel embs
    no_adj: bool = False          # ablation: zero out adjacency
    # True = reference parameterization (single W shared across layers,
    # requires in_dim == hidden_dim for num_layers > 1).
    deprel_shared_w: bool = False

    # heads
    pooling: str = "max"          # max | avg | sum
    mlp_layers: int = 2
    num_class: int = 42

    # dataset flavor ("tacred" has NER features; "semeval" does not)
    dataset: str = "tacred"
    use_bert_embeddings: bool = False

    # TPU-native: matmul compute dtype ("bfloat16" or "float32").
    # Params and accumulations stay float32 either way.
    compute_dtype: str = "float32"
    # Use the fused Pallas edge-list SpMM kernel for regular-mode GCN
    # layers (adjacency built in VMEM, never materialized in HBM).
    use_pallas: bool | str = "auto"  # True | False | "auto" (= off: with
                                     # the factored full_deprel path the
                                     # fused kernels measure within noise
                                     # of dense XLA at every batch; they
                                     # remain available for their
                                     # no-[B,N,N]-in-HBM memory property)
    # Factored full_deprel evaluation: compose per-relation matrices
    # S[r] = Σ_d table[r,d]·W[d] once per step, then one grouped (ragged)
    # matmul h[m] @ S[ids[m]] — identical math to the reference's
    # per-token contraction (model/gcn.py:400-415) at ~25× fewer FLOPs.
    # "auto" = on (it is exact); False restores the 3-operand einsum.
    deprel_factored: bool | str = "auto"
    # Graph-parallel aggregation over the mesh ``model`` axis (the GNN
    # analog of sequence/context parallelism — SURVEY.md §5; the reference
    # is single-device, reference train.py:93-94):
    #   "none"  — dense banded matmuls, adjacency replicated (default),
    #   "edges" — edge lists sharded over the axis; each device scatter-
    #             aggregates its edge shard, one psum combines
    #             (parallel.edge_partition),
    #   "halo"  — node features sharded into slabs over the axis; one
    #             all_to_all exchanges only boundary-node features
    #             (parallel.halo) — per-device feature memory is N/K.
    # Takes effect when a partition mesh is active (DistributedTrainer
    # with mesh.graph_axis > 1); otherwise falls back to the dense path.
    graph_partition: str = "none"
    # Attention-mode aggregation backend:
    #   "dense" — one [B,N,N] score matmul + masked softmax + dense
    #             aggregation per band (MXU-native; the measured winner at
    #             sentence scale: 1.78× the edge path on the full train
    #             step, interleaved; ~2.1× per band fwd+bwd —
    #             tools/step_breakdown.py --attention),
    #   "edge"  — SDDMM + edge-softmax + weighted SpMM over edge lists
    #             (O(E·H) memory: no [B,N,N]; the giant-forest regime),
    #   "auto"  — dense when the padded node count is MXU-sized (N ≤ 512),
    #             edge lists beyond.
    attention_impl: str = "auto"

    @property
    def input_dim(self) -> int:
        d = self.emb_dim + self.pos_dim
        if self.dataset == "tacred":
            d += self.ner_dim
        return d

    @property
    def gcn_input_dim(self) -> int:
        if self.rnn:
            return 2 * self.rnn_hidden
        return self.input_dim


@dataclass
class TrainConfig:
    """Optimization / driver settings (reference ``train.py:79-119``)."""

    lr: float = 1.0
    lr_decay: float = 0.9
    decay_epoch: int = 5
    optim: str = "sgd"            # sgd | adagrad | adam | adamax | adadelta
    num_epoch: int = 100
    batch_size: int = 50
    # reference accumulates gradients to an effective batch of 50
    # (train.py:209); 0 = derive as max(1, 50 // batch_size)
    effective_batch_size: int = 50
    # eval/dev/test forward batch size; 0 = same as batch_size.  Eval F1
    # is batching-invariant (padding rows are masked), so larger eval
    # batches purely cut per-epoch eval dispatches — the dominant epoch
    # cost over the remote relay at small train batch sizes
    eval_batch_size: int = 0
    max_grad_norm: float = 5.0
    log_step: int = 20
    save_epoch: int = 100
    # elastic-recovery additions over the reference retention policy
    # (which deletes every non-save_epoch checkpoint, train.py:336-337):
    # always keep the newest k epoch checkpoints so --resume loses at most
    # one interval; optionally checkpoint every save_steps optimizer steps
    # (0 = per-epoch only); write checkpoints on a background thread.
    keep_latest_checkpoints: int = 1
    save_steps: int = 0
    async_save: bool = False
    seed: int = 1234
    # PRNG backend for all on-device randomness (dropout masks, edge drop,
    # deprel forgetting): "auto" = TPU hardware rng ("rbg", measured ~0.6
    # ms/step cheaper than threefry at flagship shapes, still deterministic
    # per seed), threefry elsewhere.  "threefry" forces the JAX default.
    prng_impl: str = "auto"
    # pack each host batch into ONE buffer for transfer (13 leaf
    # transfers otherwise, each a network round trip on a tunneled TPU)
    pack_transfers: bool = True
    # wire format of the packed buffer: "compact" = natural-width uint8
    # layout (~2.75x fewer bytes; data/packing.py), "int32" = legacy
    # 4-bytes-per-value layout.  Lossless either way.
    pack_format: str = "compact"
    # >1: scan k same-bucket packed batches per dispatch (one transfer +
    # one program per k optimizer steps; bit-identical to per-step runs)
    steps_per_dispatch: int = 1
    # pre-compile the run's full program set in parallel threads before
    # epoch 1 (Trainer.warmup).  "auto" = on when steps_per_dispatch > 1
    # (where cold compiles cost ~1 min/program through the remote compile
    # service); single-process runtimes only.
    warmup_compile: str = "auto"
    # row-sparse word-embedding updates (train.sparse_emb): only the
    # vocab rows the batch touches pay optimizer traffic — O(B·N·E)
    # instead of O(V·E) per step; numerically equivalent.  "auto" = on
    # for sgd/adagrad with integer word inputs and update_gap == 1 on a
    # single device; "true"/"false" force.
    sparse_emb_grad: str = "auto"
    word_dropout: float = 0.04
    conv_l2: float = 0.0
    pooling_l2: float = 0.0
    lower: bool = False
    # Label the scorer treats as "no relation" (excluded from micro-F1).
    # "" = the dataset's own negative (TACRED "no_relation" / SemEval
    # "Other").  The reference scores BOTH datasets with the TACRED
    # scorer's literal "no_relation" (utils/scorer.py:11), so its SemEval
    # F1 counts "Other" as a positive class; pass
    # --scorer_negative_label no_relation to reproduce that exactly
    # (tools/train_compare.py --dataset semeval does).
    scorer_negative_label: str = ""

    @property
    def update_gap(self) -> int:
        return max(1, self.effective_batch_size // self.batch_size)


@dataclass
class DataConfig:
    data_dir: str = "dataset/tacred"
    vocab_dir: str = "dataset/vocab"
    train_file: str = "train.json"
    dev_file: str = "dev.json"
    test_file: str = "test.json"
    # Static-shape length buckets: each batch is padded up to the smallest
    # bucket >= its longest sentence, so XLA compiles once per bucket.
    length_buckets: Sequence[int] = (16, 32, 48, 64, 96, 128)
    # Edge budget per bucket = edge_factor * bucket_len (a pruned dependency
    # forest has < 2N forward edges; 2N covers fwd+rev handled separately).
    edge_factor: int = 1
    # Batch same-bucket sentences together (padding-waste reduction).
    group_by_length: bool = False
    # Cross-sentence packing (PackedBatcher): >0 = pack up to this many
    # sentences per node row; batch_size then counts ROWS, not examples.
    # Exact per-example math (LSTM carry resets, per-slot heads) — purely
    # a throughput mode.  0 = off (reference-compatible layout).
    pack_sentences: int = 0
    # Packed row length in tokens (0 = the largest length bucket).
    pack_len: int = 0


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit/shard_map (new surface — the reference is
    single-device only; SURVEY.md §2b)."""

    data_axis: int = 0   # 0 = use all devices on the data axis
    graph_axis: int = 1  # edge/graph-partition axis size


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    id: str = "00"
    info: str = ""
    model_save_dir: str = "saved_models"
    log: str = "logs.txt"
    # Reference-compatible artifact redirection (reference train.py:64,91,
    # 176-180): when set, confusion-matrix / misclassified dumps go to
    # test_save_dir/<id>/ instead of the run directory.
    test_save_dir: str = ""
    test_confusion_save_file: str = ""

    # ------------------------------------------------------------------ IO
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(tp, dd):
            names = {f.name for f in dataclasses.fields(tp)}
            return tp(**{k: v for k, v in dd.items() if k in names})

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            train=build(TrainConfig, d.get("train", {})),
            data=build(DataConfig, d.get("data", {})),
            mesh=build(MeshConfig, d.get("mesh", {})),
            **{
                k: d[k]
                for k in ("id", "info", "model_save_dir", "log",
                          "test_save_dir", "test_confusion_save_file")
                if k in d
            },
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=list)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def gcn_preset(**overrides: Any) -> Config:
    """The paper's plain-GCN configuration (reference ``train_gcn.sh:4``)."""
    cfg = Config()
    cfg.model.rnn = False
    cfg.model.prune_k = 1
    cfg.model.pooling = "max"
    cfg.model.mlp_layers = 2
    cfg.train.lr = 0.3
    cfg.train.pooling_l2 = 0.003
    cfg.train.seed = 0
    return _apply(cfg, overrides)


def cgcn_preset(**overrides: Any) -> Config:
    """The C-GCN configuration (reference ``train_cgcn.sh:5``)."""
    cfg = Config()
    cfg.model.rnn = True
    cfg.model.rnn_hidden = 200
    cfg.model.prune_k = 1
    cfg.model.adj_type = "full_deprel"
    cfg.model.deprel_emb_dim = 50
    cfg.train.lr = 0.3
    cfg.train.pooling_l2 = 0.003
    cfg.train.word_dropout = 0.04
    cfg.train.seed = 0
    return _apply(cfg, overrides)


def _apply(cfg: Config, overrides: dict) -> Config:
    for k, v in overrides.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg
