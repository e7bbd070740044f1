"""The GCN relation-extraction model family (flax.linen).

Capability-parity with the reference model stack
(``GCNClassifier → GCNRelationModel → GCN``, ``model/gcn.py:15-493``),
re-architected for TPU:

* adjacency is rebuilt on-device from edge lists (one scatter) instead of a
  host round-trip per forward (``model/gcn.py:102-112``),
* the BiLSTM front-end is a masked ``lax.scan`` (no sort/pack),
* all three ``adj_type`` aggregation modes are batched matmuls on the MXU
  (``gcn_tpu.ops.gcn_layers``),
* dropout/edge-drop/deprel-forgetting are explicit RNG-keyed transforms.

Parameter naming is stable so checkpoint ↔ torch-state-dict mapping is
mechanical (see ``tools/make_goldens.py``).

Deviation from the reference: ``full_deprel`` uses per-layer bilinear
weights by default (``cfg.deprel_shared_w=False``) because the reference's
single shared weight (``model/gcn.py:164-167``) only admits stacked layers
when ``gcn_input_dim == hidden_dim`` — the shipped C-GCN config actually
crashes in the reference.  Set ``deprel_shared_w=True`` for the reference
parameterization when dimensions allow.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gcn_tpu import constants
from gcn_tpu.config import ModelConfig
from gcn_tpu.ops.adjacency import build_adjacency
from gcn_tpu.ops.dropout import (
    drop_edges,
    dropout,
    embedding_dropout_mask,
    forget_deprels,
)
from gcn_tpu.ops.gcn_layers import (
    compose_relation_transforms,
    diagonal_deprel_layer,
    full_deprel_layer,
    grouped_bilinear,
    regular_layer,
)
from gcn_tpu.ops.lstm import bilstm
from gcn_tpu.ops.pooling import pool

# attention_impl=auto: largest single [B,N,N] f32 attention-score buffer
# the dense backend may allocate before auto falls back to the edge
# (SDDMM + edge-softmax) backend.  256 MiB keeps the flagship operating
# points dense (B=50, N=512 → 52 MB) while refusing the large-B memory
# cliff (peak HBM is ~bands × layers × this, plus backward residuals).
_ATTN_DENSE_BYTE_BUDGET = 256 << 20


def _uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _word_emb_init(key, shape, dtype=jnp.float32):
    """uniform(-1,1) with PAD row zeroed (reference ``model/gcn.py:73-75``)."""
    emb = jax.random.uniform(key, shape, dtype, -1.0, 1.0)
    return emb.at[constants.PAD_ID].set(0.0)


def _emb_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0,1)."""
    return jax.random.normal(key, shape, dtype)


def _deprel_emb_init(key, shape, dtype=jnp.float32):
    """N(0,1) with padding row 0 zeroed (reference ``model/gcn.py:56``)."""
    return jax.random.normal(key, shape, dtype).at[0].set(0.0)


class TorchDense(nn.Module):
    """Linear layer with torch ``nn.Linear`` default init
    (kaiming-uniform ⇒ U(±1/√fan_in) for weight and bias)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform(bound), (fan_in, self.features))
        bias = self.param("bias", _uniform(bound), (self.features,))
        y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class BiLSTM(nn.Module):
    """Parameter container for ``gcn_tpu.ops.lstm.bilstm`` with torch
    ``nn.LSTM`` init (all weights U(±1/√H))."""

    hidden: int
    num_layers: int
    dropout_rate: float
    dtype: Any = jnp.float32
    unroll: int = 1
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool, seg_start=None):
        bound = 1.0 / math.sqrt(self.hidden)
        params = []
        in_dim = x.shape[-1]
        for li in range(self.num_layers):
            layer = {}
            for d in ("fwd", "bwd"):
                layer[d] = {
                    "w_ih": self.param(
                        f"l{li}_{d}_w_ih", _uniform(bound),
                        (in_dim, 4 * self.hidden),
                    ),
                    "w_hh": self.param(
                        f"l{li}_{d}_w_hh", _uniform(bound),
                        (self.hidden, 4 * self.hidden),
                    ),
                    "b_ih": self.param(
                        f"l{li}_{d}_b_ih", _uniform(bound), (4 * self.hidden,)
                    ),
                    "b_hh": self.param(
                        f"l{li}_{d}_b_hh", _uniform(bound), (4 * self.hidden,)
                    ),
                }
            params.append(layer)
            in_dim = 2 * self.hidden
        key = None
        if not deterministic and self.dropout_rate > 0 and self.num_layers > 1:
            key = self.make_rng("dropout")
        x = x.astype(self.dtype)
        params = jax.tree.map(lambda p: p.astype(self.dtype), params)
        return bilstm(
            params, x, lengths,
            inter_dropout=self.dropout_rate,
            deterministic=deterministic,
            key=key,
            unroll=self.unroll,
            impl=self.impl,
            seg_start=seg_start,
        )


class GCNClassifier(nn.Module):
    """Full classifier: embeddings → [BiLSTM] → GCN stack → pool → MLP →
    logits.  Returns ``(logits, h_out)`` where ``h_out`` is the sentence
    pooling output used for the L2 penalty (reference ``model/gcn.py:27-30``,
    ``model/trainer.py:99-100``)."""

    cfg: ModelConfig

    @property
    def deprel_side(self) -> int:
        # reference model/gcn.py:48-55
        if self.cfg.adj_type == "diagonal_deprel":
            return self.cfg.hidden_dim
        if self.cfg.adj_type in ("regular", "attention"):
            return 1  # dummy table (unused by these modes)
        return self.cfg.deprel_emb_dim

    def _deprel_lookup(self, table, ids):
        e = jnp.take(table, ids, axis=0)
        # padding_idx=0 (reference model/gcn.py:56): row 0 is always zero
        return jnp.where((ids == 0)[..., None], jnp.zeros((), e.dtype), e)

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        words = batch["words"]
        n = words.shape[1]
        use_bert = words.ndim == 3

        # Fused Pallas path: adjacency lives only in VMEM inside the kernel
        # (gcn_tpu.ops.pallas.{spmm_fused,band_aggregate}); pooling masks
        # come from cheap edge-list degree counts instead of the dense
        # matrix.  Stochastic edge dropout samples per-band masks, which the
        # single-mask kernels don't model — fall back to dense then.
        # "auto" = off: since the factored full_deprel path removed the
        # einsum's [B·N, D·T] HBM intermediate, the measured sweep
        # (tools/step_breakdown.py --batches, bf16+rbg on v5e) shows the
        # dense-XLA and fused paths within run-to-run noise at every batch
        # (B=50: 1.56M vs 1.45M edges/s; B=100: 1.84 vs 1.82; B=200: 1.83
        # vs 1.74) with XLA slightly ahead — the kernels remain available
        # (use_pallas=true) for their no-[B,N,N]-in-HBM memory property.
        # The attention mode's backend is cfg.attention_impl (dense masked
        # softmax at sentence scale, SDDMM edge path beyond), not this flag.
        use_pallas = cfg.use_pallas
        if use_pallas == "auto":
            use_pallas = False
        edge_drop_active = (not deterministic) and cfg.edge_keep_prob < 1.0
        # Graph-parallel aggregation (trace-time context set by the
        # trainer; parallel.edge_partition / parallel.halo over the mesh
        # ``model`` axis).  Replaces BOTH the dense banded matmuls and the
        # fused Pallas kernels with the partitioned edge-list operators —
        # the scalable mode the reference never had (SURVEY.md §5).
        from gcn_tpu.utils.shard_ctx import active_partition

        part = active_partition()
        if part is not None and cfg.graph_partition == "none":
            part = None
        # adj_type=attention composes with BOTH partition modes: edges
        # (cross-shard edge-softmax: per-destination pmax + psum
        # denominators) and halo (edges live on their destination's
        # device, so the softmax is slab-local once boundary k/message
        # features arrive — parallel.halo.halo_attention_pair_arrays,
        # one stacked all_to_all per layer).
        # NOTE: halo + stochastic edge dropout is supported via
        # plan-preserving message masking: the static exchange plan keeps
        # every edge slot, and a per-edge [B, E] Bernoulli keep mask
        # (sampled on device per band, identical RNG stream to the edges
        # mode) zeroes dropped slots' l/h masks
        # (parallel.halo.masks_with_edge_keep).  Degrees/denominators are
        # computed pre-dropout, matching the reference
        # (model/gcn.py:261 denom vs :313,:347 per-layer drops).
        use_fused = (part is None) and use_pallas and (
            (cfg.adj_type == "regular" and not cfg.no_adj)
            or (
                cfg.adj_type in ("diagonal_deprel", "full_deprel")
                and not edge_drop_active
            )
        )
        # attention backend: dense masked-softmax bands at sentence scale
        # (MXU matmuls; 1.78× the edge path on the full step, ~2.1×/band at flagship
        # shapes), edge lists (SDDMM + edge-softmax + SpMM) beyond
        attn_impl = cfg.attention_impl
        if attn_impl not in ("auto", "dense", "edge"):
            raise ValueError(
                f"unknown attention_impl {attn_impl!r}: "
                "expected auto | dense | edge"
            )
        if attn_impl == "auto":
            # Gate on the [B,N,N] f32 score/softmax buffer FOOTPRINT, not
            # N alone: B scales it linearly and the backward keeps
            # residuals (~2 bands × layers of these), so pure-N gating
            # hits a memory cliff at large batch.  NOTE: under length
            # bucketing, different buckets of one run can resolve to
            # different backends (numerics differ at ~1e-6 — equivalence
            # is covered by tests/test_model_parity.py's backend-parity
            # case); pin --attention_impl to force one backend.
            # Budget set from the measured dense/edge crossover sweep
            # (tools/large_forest_bench.py --attention on the v5e,
            # 65k-node forest, hidden 256, docs/design.md §7): dense
            # leads 9.4x at a 32 MB score buffer, 3.1x at 128 MB, 1.33x
            # at 256 MB, and degrades steeply past that (1.05M edges/s
            # at 512 MB) — 256 MB is the measured knee.  The edge path
            # owns the beyond-budget regime, with its own VMEM ceiling
            # near E=N=2048 per row (prefer shorter packed rows there).
            b = words.shape[0]
            attn_impl = ("dense"
                         if b * n * n * 4 <= _ATTN_DENSE_BYTE_BUDGET
                         else "edge")
        attn_edge = cfg.adj_type == "attention" and attn_impl == "edge"
        denom = None
        if part is not None:
            from gcn_tpu.ops.spmm import node_degrees

            deg_out, deg_in, incident = node_degrees(
                batch["edge_parent"], batch["edge_child"],
                batch["edge_mask"], n, dtype=dtype,
            )
            adj = None
            pool_exclude = ~incident
            # same normalizer as ops.adjacency.build_adjacency
            denom = (
                deg_out + deg_in + incident.astype(dtype) + 1.0
            )[:, :, None]
        elif use_fused or attn_edge:
            from gcn_tpu.ops.spmm import node_degrees

            _, _, incident = node_degrees(
                batch["edge_parent"], batch["edge_child"],
                batch["edge_mask"], n,
            )
            adj = None
            pool_exclude = ~incident
        else:
            adj = build_adjacency(
                batch["edge_parent"], batch["edge_child"],
                batch["edge_mask"], n, dtype=dtype,
            )
            pool_exclude = adj.pool_mask

        def rng():
            return self.make_rng("dropout")

        # ---------------------------------------------------------- embeddings
        if use_bert:
            word_vecs = words.astype(dtype)
        else:
            if "word_vecs" in batch:
                # row-sparse embedding-gradient path (trainer feature): the
                # caller gathered the rows OUTSIDE the differentiated
                # closure and differentiates w.r.t. these rows instead of
                # the [V,E] table — the table param is deliberately never
                # touched here so its dense cotangent is a dead zero
                # (TPU analog of the reference's sparse-grad MyAdagrad,
                # utils/torch_utils.py:60-80)
                word_vecs = batch["word_vecs"]
            else:
                emb = self.param(
                    "word_emb", _word_emb_init, (cfg.vocab_size, cfg.emb_dim)
                )
                word_vecs = jnp.take(emb, words, axis=0)
            if not deterministic and cfg.emb_dropout > 0:
                mult = embedding_dropout_mask(
                    rng(), words, cfg.vocab_size, cfg.emb_dropout, False
                )
                word_vecs = word_vecs * mult.astype(word_vecs.dtype)
            # padding_idx=0 semantics (reference model/gcn.py:45)
            word_vecs = jnp.where(
                (words == 0)[..., None], jnp.zeros((), word_vecs.dtype),
                word_vecs,
            )
        embs = [word_vecs.astype(dtype)]
        if cfg.pos_dim > 0:
            # TACRED: 47 tags (reference model/gcn.py:46).  SemEval adds a
            # 'pad' tag at id 47 which would index out-of-bounds in the
            # reference's TACRED-sized table — we size per dataset.
            from gcn_tpu.data.dataset import constants_for

            n_pos = len(constants_for(cfg.dataset).POS_TO_ID)
            pos_emb = self.param(
                "pos_emb", _emb_init, (n_pos, cfg.pos_dim)
            )
            embs.append(jnp.take(pos_emb, batch["pos"], axis=0).astype(dtype))
        if cfg.ner_dim > 0 and cfg.dataset == "tacred":
            ner_emb = self.param(
                "ner_emb", _emb_init, (len(constants.NER_TO_ID), cfg.ner_dim)
            )
            embs.append(jnp.take(ner_emb, batch["ner"], axis=0).astype(dtype))
        h = jnp.concatenate(embs, axis=2)
        h = dropout(rng() if not deterministic else None, h,
                    cfg.input_dropout, deterministic)
        # activation taps at the reference's layer boundaries (its in_drop/
        # rnn_drop/gcn_drop hook points, model/gcn.py:247,251,393) — read
        # back with apply(..., mutable=["intermediates"]) for per-layer
        # parity tests
        self.sow("intermediates", "in_drop", h)

        # ------------------------------------------------------------- BiLSTM
        if cfg.rnn:
            h = BiLSTM(
                hidden=cfg.rnn_hidden,
                num_layers=cfg.rnn_layers,
                dropout_rate=cfg.rnn_dropout,
                dtype=dtype,
                unroll=cfg.rnn_unroll,
                impl=cfg.rnn_impl,
                name="rnn",
            )(h, batch["lengths"], deterministic,
              seg_start=batch.get("seg_start"))
            h = dropout(rng() if not deterministic else None, h,
                        cfg.rnn_dropout, deterministic)
            self.sow("intermediates", "rnn_drop", h)

        if cfg.adj_type == "diagonal_deprel":
            h = TorchDense(cfg.hidden_dim, dtype=dtype, name="preprocessor")(h)

        # ---------------------------------------------------------- GCN stack
        deprel_table = self.param(
            "deprel_emb", _deprel_emb_init,
            (len(constants.DEPREL_TO_ID), self.deprel_side),
        ).astype(dtype)
        deprel = batch["deprel"]
        if adj is not None:
            denom = adj.denom.astype(dtype)

        deprel_ws = None
        if cfg.adj_type == "full_deprel":
            d = cfg.deprel_emb_dim
            t0 = h.shape[-1]
            if cfg.deprel_shared_w:
                if cfg.num_layers > 1 and t0 != cfg.hidden_dim:
                    raise ValueError(
                        "deprel_shared_w requires gcn_input_dim == hidden_dim"
                        " for stacked layers (the reference's latent "
                        "constraint, model/gcn.py:164-167)"
                    )
                bound = 1.0 / math.sqrt(t0)
                w = self.param("gcn_deprel_w", _uniform(bound),
                               (d, t0, cfg.hidden_dim))
                b = self.param("gcn_deprel_b", _uniform(bound),
                               (d, cfg.hidden_dim))
                deprel_ws = [(w, b)] * cfg.num_layers
            else:
                deprel_ws = []
                for l in range(cfg.num_layers):
                    t_l = t0 if l == 0 else cfg.hidden_dim
                    bound = 1.0 / math.sqrt(t_l)
                    deprel_ws.append((
                        self.param(f"gcn_deprel_w{l}", _uniform(bound),
                                   (d, t_l, cfg.hidden_dim)),
                        self.param(f"gcn_deprel_b{l}", _uniform(bound),
                                   (d, cfg.hidden_dim)),
                    ))

        def finish_layer(h, l):
            """Inter-layer dropout + activation tap (reference
            ``model/gcn.py:393``: gcn_drop on every non-final layer)."""
            # per-layer ReLU output tap (alive-fraction diagnostics,
            # tools/liftoff_diag.py) — sow is a no-op unless the caller
            # requests the 'intermediates' collection
            self.sow("intermediates", f"gcn_out{l}", h)
            if l < cfg.num_layers - 1:
                h = dropout(rng() if not deterministic else None, h,
                            cfg.gcn_dropout, deterministic)
                self.sow("intermediates", "gcn_drop", h)
            return h

        fd_plans: dict = {}  # sort plans shared across layers when
                             # relation ids are layer-invariant
        for l in range(cfg.num_layers):
            if cfg.adj_type == "regular":
                t_in = h.shape[-1]
                bound = 1.0 / math.sqrt(t_in)
                w = self.param(f"gcn_w{l}_kernel", _uniform(bound),
                               (t_in, cfg.hidden_dim)).astype(dtype)
                b = self.param(f"gcn_w{l}_bias", _uniform(bound),
                               (cfg.hidden_dim,)).astype(dtype)
                if use_fused:
                    from gcn_tpu.ops.pallas.spmm_fused import fused_gcn_spmm

                    # kernel fuses aggregation + denom + ReLU
                    h = fused_gcn_spmm(
                        batch["edge_parent"], batch["edge_child"],
                        batch["edge_mask"], h, w, b,
                    )
                    h = finish_layer(h, l)
                    continue
                if part is not None:
                    # partitioned A_c @ h + h = A_f h + A_fᵀ h + diag + h
                    # (same math as ops.gcn_layers.regular_layer)
                    if cfg.no_adj:
                        ax = h
                    else:
                        ax = (
                            self._part_agg_pair(part, batch, h, h)
                            + incident.astype(dtype)[:, :, None] * h
                            + h
                        )
                    axw = jnp.matmul(ax, w) + 2.0 * b
                else:
                    axw = regular_layer(h, adj.combined, w, b,
                                        no_adj=cfg.no_adj)
            elif cfg.adj_type == "attention":
                # Edge-attention aggregation (NEW — the reference only
                # sketched this: the --deprel_attn flag and masked_softmax
                # at model/gcn.py:199-227 are dead code).  Scaled dot-
                # product scores per tree edge via SDDMM, softmax-normalized
                # over each destination's incoming edges, applied as
                # per-edge weights in the edge-list SpMM.  Entirely
                # edge-list native: no dense adjacency at all.
                from gcn_tpu.ops.pallas.sddmm import edge_softmax, sddmm
                from gcn_tpu.ops.spmm import spmm_forward, spmm_reverse

                t_in = h.shape[-1]
                bound = 1.0 / math.sqrt(t_in)
                w = self.param(f"gcn_w{l}_kernel", _uniform(bound),
                               (t_in, cfg.hidden_dim)).astype(dtype)
                b = self.param(f"gcn_w{l}_bias", _uniform(bound),
                               (cfg.hidden_dim,)).astype(dtype)
                dk = cfg.hidden_dim
                wq = self.param(f"attn_q{l}", _uniform(bound),
                                (t_in, dk)).astype(dtype)
                wk = self.param(f"attn_k{l}", _uniform(bound),
                                (t_in, dk)).astype(dtype)
                q = h @ wq
                k = h @ wk
                scale = 1.0 / math.sqrt(dk)
                ep, ec = batch["edge_parent"], batch["edge_child"]
                em = batch["edge_mask"]
                hw = h @ w
                if part is not None and part[0] == "halo":
                    # node-sharded slabs: every edge lives on its dst's
                    # device, so the per-dst softmax is slab-local; ONE
                    # stacked all_to_all ships boundary concat(k, hw)
                    # for both bands (parallel.halo)
                    from gcn_tpu.parallel.halo import (
                        halo_attention_pair_arrays,
                    )

                    _, mesh_p, axis_p, da_p = part
                    arrs_f = self._halo_plan_arrays(batch, "f", None)
                    arrs_r = self._halo_plan_arrays(batch, "r", None)
                    kq = int(arrs_f[0].shape[0])
                    slab = -(-n // kq)
                    pad_n = kq * slab - n
                    qs = q * scale
                    kv = jnp.concatenate([k, hw], axis=-1)
                    if pad_n:
                        qs = jnp.pad(qs, ((0, 0), (0, pad_n), (0, 0)))
                        kv = jnp.pad(kv, ((0, 0), (0, pad_n), (0, 0)))
                    agg = halo_attention_pair_arrays(
                        mesh_p, qs, kv, dk, arrs_f, arrs_r,
                        axis=axis_p, data_axis=da_p,
                    )
                    agg = agg[:, :n] if pad_n else agg
                elif part is not None:
                    # graph_partition=edges: shard-local scores + weighted
                    # scatter, cross-shard softmax normalizers (one pmax +
                    # one [B,N] psum per band), BOTH bands' partials summed
                    # before one [B,N,H] psum — parallel.edge_partition
                    from gcn_tpu.parallel.edge_partition import (
                        partitioned_attention_layer,
                    )

                    mode_p, mesh_p, axis_p, da_p = part
                    ax_sz = mesh_p.shape[axis_p]
                    epp, ecp, emp = ep, ec, em
                    pad_e = (-ep.shape[1]) % ax_sz
                    if pad_e:
                        epp = jnp.pad(epp, ((0, 0), (0, pad_e)))
                        ecp = jnp.pad(ecp, ((0, 0), (0, pad_e)))
                        emp = jnp.pad(emp, ((0, 0), (0, pad_e)))
                    agg = partitioned_attention_layer(
                        mesh_p, q * scale, k, hw, epp, ecp, emp,
                        axis=axis_p, data_axis=da_p,
                    )
                elif attn_impl == "dense":
                    # Both bands share ONE dense score matrix
                    # S[b,x,y] = q[x]·k[y] (the edge path's sddmm values:
                    # forward band scores q[parent]·k[child], reverse
                    # q[child]·k[parent]) — masked softmax per destination
                    # row, aggregation as a dense matmul.  All MXU work;
                    # allclose-tested against the edge path.
                    s = jnp.einsum("bxh,byh->bxy", q, k) * scale
                    s = s.astype(jnp.float32)
                    # adjacency cells carry edge MULTIPLICITY (scatter-add
                    # of 1s): weighting exp(s) by the count makes a
                    # duplicated (parent, child) edge contribute twice to
                    # both the softmax denominator and the aggregate,
                    # exactly like the edge-list path (parity-tested on a
                    # multigraph)
                    cnt_f = adj.forward.astype(s.dtype)  # dst=parent rows
                    cnt_r = jnp.swapaxes(cnt_f, 1, 2)    # dst=child rows
                    agg = None
                    for cnt in (cnt_f, cnt_r):
                        m = cnt > 0
                        sm = jnp.where(m, s, -1e30)
                        mx = jax.lax.stop_gradient(
                            jnp.max(sm, axis=2, keepdims=True))
                        ex = jnp.where(m, cnt * jnp.exp(sm - mx),
                                       jnp.zeros((), s.dtype))
                        den = jnp.maximum(
                            ex.sum(axis=2, keepdims=True), 1e-30)
                        a = (ex / den).astype(dtype)
                        band = jnp.einsum("bxy,byh->bxh", a, hw)
                        agg = band if agg is None else agg + band
                else:
                    # forward band: messages child→parent, normalized at
                    # parent
                    s_f = sddmm(ep, ec, em, q, k) * scale
                    a_f = edge_softmax(ep, s_f, em, n)
                    agg = spmm_forward(hw, ep, ec, em, edge_weights=a_f)
                    # reverse band: messages parent→child, normalized at
                    # child
                    s_r = sddmm(ec, ep, em, q, k) * scale
                    a_r = edge_softmax(ec, s_r, em, n)
                    agg = agg + spmm_reverse(hw, ep, ec, em,
                                             edge_weights=a_r)
                # self connection (unnormalized, like the regular mode's
                # W(h) term)
                axw = agg + hw + b
                h = jax.nn.relu(axw)
                h = finish_layer(h, l)
                continue
            elif cfg.adj_type == "diagonal_deprel":
                e_fwd = self._deprel_lookup(deprel_table, deprel)
                e_rev = jnp.take(
                    deprel_table, deprel + constants.DEPREL_FORWARD_BOUND,
                    axis=0,
                )
                e_self = deprel_table[constants.SELF_LOOP_INDEX][None, None, :]
                if use_fused:
                    from gcn_tpu.ops.pallas.band_aggregate import (
                        fused_band_aggregate,
                    )

                    h = fused_band_aggregate(
                        batch["edge_parent"], batch["edge_child"],
                        batch["edge_mask"],
                        e_fwd * h, e_rev * h,
                        jnp.broadcast_to(e_self * h, h.shape),
                    )
                    h = finish_layer(h, l)
                    continue
                if part is not None:
                    # partitioned A_f (e_fwd⊙h) + A_fᵀ (e_rev⊙h) + e_self⊙h
                    axw = (
                        self._part_agg_pair(part, batch, e_fwd * h,
                                            e_rev * h)
                        + e_self * h
                    )
                else:
                    axw = diagonal_deprel_layer(h, adj.forward, e_fwd,
                                                e_rev, e_self)
            elif cfg.adj_type == "full_deprel":
                w, b = deprel_ws[l]
                if use_fused:
                    from gcn_tpu.ops.pallas.band_aggregate import (
                        fused_band_aggregate,
                    )

                    x_f, x_r, x_s = self._full_deprel_components(
                        h, deprel_table, deprel, l, w, b, dtype,
                        deterministic, fd_plans,
                    )
                    h = fused_band_aggregate(
                        batch["edge_parent"], batch["edge_child"],
                        batch["edge_mask"], x_f, x_r, x_s,
                    )
                    h = finish_layer(h, l)
                    continue
                if part is not None:
                    # Per-band edge dropout on the EDGE LIST ([B,E] keep
                    # masks; halo maps them onto plan slots via
                    # masks_with_edge_keep, so both partition modes drop
                    # IDENTICAL edges from the same RNG stream).  The
                    # realized masks differ from the dense path's [B,N,N]
                    # band dropout as RNG draws, not in distribution.
                    em_f = em_r = None
                    if edge_drop_active:
                        em0 = batch["edge_mask"]
                        em_f = em0 & jax.random.bernoulli(
                            rng(), cfg.edge_keep_prob, em0.shape
                        )
                        if not cfg.deprel_directed:
                            em_r = em0 & jax.random.bernoulli(
                                rng(), cfg.edge_keep_prob, em0.shape
                            )
                    x_f, x_r, x_s = self._full_deprel_components(
                        h, deprel_table, deprel, l, w, b, dtype,
                        deterministic, fd_plans, bilinear_impl="xla",
                    )
                    if cfg.deprel_directed:
                        axw = self._part_agg(part, batch, x_f,
                                             em_override=em_f)
                    else:
                        axw = self._part_agg_pair(
                            part, batch, x_f, x_r,
                            em_f=em_f, em_r=em_r,
                        )
                    axw = axw + x_s
                else:
                    axw = self._full_deprel(
                        h, adj, deprel_table, deprel, l, w, b, dtype,
                        deterministic, fd_plans,
                    )
            else:
                raise ValueError(f"unknown adj_type: {cfg.adj_type}")

            axw = axw / denom
            h = jax.nn.relu(axw)
            h = finish_layer(h, l)

        # ------------------------------------------------------------ pooling
        kind = cfg.pooling
        if "slot_mask" in batch:
            # cross-sentence-packed rows (data.dataset.PackedBatcher):
            # several sentences share one node row; every per-example head
            # quantity is per SLOT.  slot_mask/subj_mask/obj_mask are
            # [B,S,N] include-masks; labels/example_mask arrive flattened
            # [B*S] in row-major slot order, so the loss/scorer path is
            # unchanged downstream.
            from gcn_tpu.ops.pooling import pool_slots

            slot = batch["slot_mask"]
            sent_ex = (~slot) | pool_exclude[:, None, :]
            h_out = pool_slots(h, sent_ex, kind)                 # [B,S,H]
            subj_out = pool_slots(h, ~batch["subj_mask"], kind)
            obj_out = pool_slots(h, ~batch["obj_mask"], kind)
            out = jnp.concatenate([h_out, subj_out, obj_out], axis=2)
            out = out.reshape(-1, out.shape[-1])                 # [B·S, 3H]
            h_out = h_out.reshape(-1, h_out.shape[-1])           # [B·S, H]
        else:
            h_out = pool(h, pool_exclude, kind)
            subj_out = pool(h, ~batch["subj_mask"], kind)
            obj_out = pool(h, ~batch["obj_mask"], kind)
            out = jnp.concatenate([h_out, subj_out, obj_out], axis=1)

        # --------------------------------------------------------- output MLP
        for i in range(cfg.mlp_layers):
            out = TorchDense(cfg.hidden_dim, dtype=dtype, name=f"mlp{i}")(out)
            out = jax.nn.relu(out)
            self.sow("intermediates", f"mlp{i}_relu", out)
        logits = TorchDense(cfg.num_class, dtype=dtype, name="classifier")(out)
        return logits.astype(jnp.float32), h_out.astype(jnp.float32)

    # -------------------------------------------------------- partitioning
    def _part_agg(self, part, batch, x, reverse: bool = False,
                  em_override=None):
        """``A_f @ x`` (or ``A_fᵀ @ x``) through the active graph-parallel
        operator (``utils.shard_ctx.active_partition``):

        * "edges": edge list sharded over the mesh ``model`` axis, one
          psum combines partial aggregates (``parallel.edge_partition``),
        * "halo": node features sharded into slabs, one all_to_all of
          boundary features (``parallel.halo``); the per-batch exchange
          plans ride in the batch dict (``attach_halo_plans``).
        """
        mode, mesh, axis, da = part
        if mode == "edges":
            from gcn_tpu.parallel.edge_partition import (
                partitioned_aggregate,
            )

            ep, ec = batch["edge_parent"], batch["edge_child"]
            em = batch["edge_mask"] if em_override is None else em_override
            ax_sz = mesh.shape[axis]
            pad_e = (-ep.shape[1]) % ax_sz
            if pad_e:
                ep = jnp.pad(ep, ((0, 0), (0, pad_e)))
                ec = jnp.pad(ec, ((0, 0), (0, pad_e)))
                em = jnp.pad(em, ((0, 0), (0, pad_e)))
            return partitioned_aggregate(
                mesh, x, ep, ec, em, reverse=reverse, axis=axis,
                data_axis=da,
            )
        # halo
        from gcn_tpu.parallel.halo import halo_aggregate_arrays

        arrs = self._halo_plan_arrays(batch, "r" if reverse else "f",
                                      em_override)
        k = int(arrs[0].shape[0])
        n = x.shape[1]
        slab = -(-n // k)
        pad = k * slab - n
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        out = halo_aggregate_arrays(mesh, xp, *arrs, axis=axis,
                                    data_axis=da)
        return out[:, :n] if pad else out

    def _halo_plan_arrays(self, batch, tag: str, em_override):
        """One band's plan arrays, with an optional per-edge keep mask
        folded into the slot masks (stochastic edge dropout)."""
        from gcn_tpu.parallel.halo import (
            edge_slots_from_batch,
            masks_with_edge_keep,
            plans_from_batch,
        )

        if "hplan_f_req" not in batch:
            raise ValueError(
                "graph_partition=halo requires hplan_* plan arrays in the "
                "batch — attach them with parallel.halo.attach_halo_plans "
                "(the Batcher does this when halo_devices is set)"
            )
        arrs = plans_from_batch(batch, tag)
        if em_override is not None:
            arrs = masks_with_edge_keep(
                arrs, edge_slots_from_batch(batch, tag), em_override
            )
        return arrs

    def _part_agg_pair(self, part, batch, x_f, x_r, em_f=None, em_r=None):
        """``A_f @ x_f + A_fᵀ @ x_r`` through the active graph-parallel
        operator.  In halo mode the two bands share ONE ``all_to_all``
        (``parallel.halo.halo_aggregate_pair_arrays``) — half the
        per-layer collectives of calling ``_part_agg`` twice; edges mode
        keeps its two psum'd partial aggregates."""
        mode, mesh, axis, da = part
        if mode == "edges":
            return (
                self._part_agg(part, batch, x_f, em_override=em_f)
                + self._part_agg(part, batch, x_r, reverse=True,
                                 em_override=em_r)
            )
        from gcn_tpu.parallel.halo import halo_aggregate_pair_arrays

        arrs_f = self._halo_plan_arrays(batch, "f", em_f)
        arrs_r = self._halo_plan_arrays(batch, "r", em_r)
        k = int(arrs_f[0].shape[0])
        n = x_f.shape[1]
        slab = -(-n // k)
        pad = k * slab - n
        if pad:
            x_f = jnp.pad(x_f, ((0, 0), (0, pad), (0, 0)))
            x_r = jnp.pad(x_r, ((0, 0), (0, pad), (0, 0)))
        out = halo_aggregate_pair_arrays(
            mesh, x_f, x_r, arrs_f, arrs_r, axis=axis, data_axis=da
        )
        return out[:, :n] if pad else out

    # ------------------------------------------------------------ full_deprel
    def _use_factored(self) -> bool:
        v = self.cfg.deprel_factored
        return True if v in ("auto", "ragged", "pallas") else bool(v)

    def _factored_impl(self) -> str:
        v = self.cfg.deprel_factored
        return v if v in ("ragged", "pallas") else "auto"

    def _band_relation_ids(self, ids, ones_id, zero_id, zero_guard,
                           past_depth, deterministic):
        """Effective relation id per token for one band of the factored
        path.  Mirrors the e-vector construction of the einsum path exactly
        (including RNG consumption): the padding zero-guard of
        ``_deprel_lookup``, per-token deprel forgetting → the all-ones row
        (reference ``maybe_forget_deprels``, ``model/gcn.py:451-470``), and
        the ``deprel_max_depth`` all-ones override."""
        cfg = self.cfg
        if zero_guard:
            ids = jnp.where(ids == 0, zero_id, ids)
        if not deterministic and cfg.deprel_keep_prop < 1.0:
            # same key shape/order as ops.dropout.forget_deprels so the
            # two paths are bit-identical under one rng stream
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), cfg.deprel_keep_prop,
                ids.shape + (1,),
            )[..., 0]
            ids = jnp.where(keep, ids, ones_id)
        if past_depth:
            ids = jnp.full_like(ids, ones_id)
        return ids

    def _factored_tables(self, deprel_table, w, b, dtype):
        """Augmented relation table (+ all-ones and all-zeros rows) and its
        composed per-relation transforms S[r]=Σ_d table[r,d]·W[d]."""
        d = deprel_table.shape[1]
        table_aug = jnp.concatenate(
            [deprel_table,
             jnp.ones((1, d), dtype),
             jnp.zeros((1, d), dtype)], axis=0,
        )
        s, bs = compose_relation_transforms(
            table_aug, w.astype(dtype), b.astype(dtype)
        )
        return s, bs

    def _group_plan(self, plans, key, ids, n_groups, deterministic):
        """Reuse the sort plan across layers when relation ids are
        layer-invariant (forgetting off / eval mode)."""
        from gcn_tpu.ops.gcn_layers import make_group_plan

        reusable = (plans is not None) and (
            deterministic or self.cfg.deprel_keep_prop >= 1.0
        )
        if reusable and key in plans:
            return plans[key]
        plan = make_group_plan(ids, n_groups)
        if reusable:
            plans[key] = plan
        return plan

    def _full_deprel_factored(self, h, adj, deprel_table, deprel, l, w, b,
                              dtype, deterministic, plans=None):
        """Factored evaluation of the full_deprel layer: per-token bilinear
        transforms become one grouped matmul against per-relation composed
        matrices (``ops.gcn_layers.compose_relation_transforms``) — ~25×
        fewer FLOPs than the reference contraction it replaces
        (``model/gcn.py:400-415``), same math to float reassociation."""
        cfg = self.cfg
        stochastic = not deterministic
        past_depth = l >= cfg.deprel_max_depth
        r = deprel_table.shape[0]
        ones_id, zero_id = r, r + 1
        s, bs = self._factored_tables(deprel_table, w, b, dtype)

        def rng():
            return self.make_rng("dropout")

        # forward band (rng order matches the einsum path: edge-drop fwd,
        # forget fwd, edge-drop rev, forget rev)
        a_f = adj.forward
        if stochastic and cfg.edge_keep_prob < 1.0:
            a_f = drop_edges(rng(), a_f, cfg.edge_keep_prob, False)
        ids_f = self._band_relation_ids(
            deprel, ones_id, zero_id, True, past_depth, deterministic
        )
        impl = self._factored_impl()

        if not cfg.deprel_directed:
            a_r = adj.reverse
            if stochastic and cfg.edge_keep_prob < 1.0:
                a_r = drop_edges(rng(), a_r, cfg.edge_keep_prob, False)
            ids_r = self._band_relation_ids(
                deprel + constants.DEPREL_FORWARD_BOUND, ones_id, zero_id,
                False, past_depth, deterministic,
            )
            # both bands share W (and therefore S): one grouped matmul over
            # the stacked bands reads each composed matrix once, not twice
            ids2 = jnp.concatenate([ids_f, ids_r], axis=0)
            plan = self._group_plan(
                plans, ("stk", l >= cfg.deprel_max_depth), ids2,
                s.shape[0], deterministic,
            )
            x2 = grouped_bilinear(
                jnp.concatenate([h, h], axis=0), ids2, s, bs,
                impl=impl, plan=plan,
            )
            bsz = h.shape[0]
            out = jnp.matmul(a_f, x2[:bsz]) + jnp.matmul(a_r, x2[bsz:])
        else:
            plan = self._group_plan(
                plans, ("fwd", l >= cfg.deprel_max_depth), ids_f,
                s.shape[0], deterministic,
            )
            out = jnp.matmul(a_f, grouped_bilinear(h, ids_f, s, bs,
                                                   impl=impl, plan=plan))

        if cfg.deprel_self_loop:
            from gcn_tpu.ops.gcn_layers import self_loop_traverse

            e_self = deprel_table[constants.SELF_LOOP_INDEX]
            if past_depth:
                e_self = jnp.ones((cfg.deprel_emb_dim,), dtype)
            out = out + self_loop_traverse(h, e_self, w.astype(dtype),
                                           b.astype(dtype))
        return out

    def _full_deprel(self, h, adj, deprel_table, deprel, l, w, b, dtype,
                     deterministic, plans=None):
        if self._use_factored():
            return self._full_deprel_factored(
                h, adj, deprel_table, deprel, l, w, b, dtype, deterministic,
                plans,
            )
        cfg = self.cfg
        d = cfg.deprel_emb_dim
        w = w.astype(dtype)
        b = b.astype(dtype)

        def rng():
            return self.make_rng("dropout")

        stochastic = not deterministic
        past_depth = l >= cfg.deprel_max_depth
        ones_e = jnp.ones(h.shape[:2] + (d,), dtype)

        # forward band (reference model/gcn.py:307-335)
        a_f = adj.forward
        if stochastic and cfg.edge_keep_prob < 1.0:
            a_f = drop_edges(rng(), a_f, cfg.edge_keep_prob, False)
        e_fwd = self._deprel_lookup(deprel_table, deprel)
        if stochastic and cfg.deprel_keep_prop < 1.0:
            e_fwd = forget_deprels(rng(), e_fwd, cfg.deprel_keep_prop, False)
        if past_depth:
            e_fwd = ones_e

        e_rev = None
        a_r = None
        if not cfg.deprel_directed:
            a_r = adj.reverse
            if stochastic and cfg.edge_keep_prob < 1.0:
                a_r = drop_edges(rng(), a_r, cfg.edge_keep_prob, False)
            e_rev = jnp.take(
                deprel_table, deprel + constants.DEPREL_FORWARD_BOUND, axis=0
            )
            if stochastic and cfg.deprel_keep_prop < 1.0:
                e_rev = forget_deprels(rng(), e_rev,
                                       cfg.deprel_keep_prop, False)
            if past_depth:
                e_rev = ones_e

        e_self = None
        if cfg.deprel_self_loop:
            e_self = deprel_table[constants.SELF_LOOP_INDEX]
            if past_depth:
                e_self = jnp.ones((d,), dtype)

        return full_deprel_layer(h, a_f, e_fwd, e_rev, e_self, w, b,
                                 adj_reverse=a_r)

    def _full_deprel_components(self, h, deprel_table, deprel, l, w, b,
                                dtype, deterministic, plans=None,
                                bilinear_impl: str = "pallas"):
        """Per-band message tensors for the fused Pallas / partitioned
        aggregation: (x_f, x_r, x_self) such that the layer output is
        ``(A_f x_f + A_fᵀ x_r + x_self)/denom``.  ``bilinear_impl`` picks
        the non-factored per-token transform engine: "pallas" (the fused
        bilinear kernel) or "xla" (``ops.gcn_layers.bilinear_traverse`` —
        used by the partitioned paths, which must run on any backend)."""
        from gcn_tpu.ops.gcn_layers import (
            bilinear_traverse,
            self_loop_traverse,
        )

        if bilinear_impl == "pallas":
            from gcn_tpu.ops.pallas.deprel_bilinear import (
                deprel_bilinear_batched,
            )
        else:
            def deprel_bilinear_batched(h_, e_, w_, b_):
                return bilinear_traverse(h_, e_, w_, b_)

        cfg = self.cfg
        d = cfg.deprel_emb_dim
        w = w.astype(dtype)
        b = b.astype(dtype)

        def rng():
            return self.make_rng("dropout")

        stochastic = not deterministic
        past_depth = l >= cfg.deprel_max_depth
        ones_e = jnp.ones(h.shape[:2] + (d,), dtype)

        if self._use_factored():
            # grouped-matmul bilinear (same factored math as the dense
            # path) feeding the fused Pallas band aggregation
            r = deprel_table.shape[0]
            ones_id, zero_id = r, r + 1
            s, bs = self._factored_tables(deprel_table, w, b, dtype)
            ids_f = self._band_relation_ids(
                deprel, ones_id, zero_id, True, past_depth, deterministic
            )
            impl = self._factored_impl()
            if not cfg.deprel_directed:
                ids_r = self._band_relation_ids(
                    deprel + constants.DEPREL_FORWARD_BOUND, ones_id,
                    zero_id, False, past_depth, deterministic,
                )
                ids2 = jnp.concatenate([ids_f, ids_r], axis=0)
                plan = self._group_plan(
                    plans, ("stk", past_depth), ids2, s.shape[0],
                    deterministic,
                )
                x2 = grouped_bilinear(
                    jnp.concatenate([h, h], axis=0), ids2, s, bs,
                    impl=impl, plan=plan,
                )
                bsz = h.shape[0]
                x_f, x_r = x2[:bsz], x2[bsz:]
            else:
                plan = self._group_plan(
                    plans, ("fwd", past_depth), ids_f, s.shape[0],
                    deterministic,
                )
                x_f = grouped_bilinear(h, ids_f, s, bs, impl=impl,
                                       plan=plan)
                x_r = jnp.zeros(h.shape[:2] + (cfg.hidden_dim,), h.dtype)
            if cfg.deprel_self_loop:
                e_self = deprel_table[constants.SELF_LOOP_INDEX]
                if past_depth:
                    e_self = jnp.ones((d,), dtype)
                x_s = jnp.broadcast_to(
                    self_loop_traverse(h, e_self, w, b), x_f.shape
                )
            else:
                x_s = jnp.zeros_like(x_f)
            return x_f, x_r, x_s

        e_fwd = self._deprel_lookup(deprel_table, deprel)
        if stochastic and cfg.deprel_keep_prop < 1.0:
            e_fwd = forget_deprels(rng(), e_fwd, cfg.deprel_keep_prop, False)
        if past_depth:
            e_fwd = ones_e
        x_f = deprel_bilinear_batched(h, e_fwd, w, b)

        if not cfg.deprel_directed:
            e_rev = jnp.take(
                deprel_table, deprel + constants.DEPREL_FORWARD_BOUND, axis=0
            )
            if stochastic and cfg.deprel_keep_prop < 1.0:
                e_rev = forget_deprels(rng(), e_rev,
                                       cfg.deprel_keep_prop, False)
            if past_depth:
                e_rev = ones_e
            x_r = deprel_bilinear_batched(h, e_rev, w, b)
        else:
            x_r = jnp.zeros(h.shape[:2] + (cfg.hidden_dim,), h.dtype)

        if cfg.deprel_self_loop:
            e_self = deprel_table[constants.SELF_LOOP_INDEX]
            if past_depth:
                e_self = jnp.ones((d,), dtype)
            x_s = self_loop_traverse(h, e_self, w, b)
            x_s = jnp.broadcast_to(x_s, x_f.shape)
        else:
            x_s = jnp.zeros_like(x_f)
        return x_f, x_r, x_s
