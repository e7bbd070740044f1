"""gcn_tpu — a TPU-native framework for GCN relation extraction over
pruned dependency trees (JAX / XLA / Pallas / pjit).

Built from scratch with capability parity to the reference
gstoica27/gcn-over-pruned-trees (see SURVEY.md); architecture is TPU-first:
load-time graph pruning into edge lists, on-device adjacency scatter, MXU
batched aggregation, masked-scan BiLSTM, pjit/shard_map parallelism.
"""

__version__ = "0.1.0"
