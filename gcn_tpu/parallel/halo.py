"""Node-partitioned aggregation with boundary (halo) exchange.

The scalable graph-parallel mode (SURVEY.md §5 "long-context analog",
§7 hard-part 7).  The token/node axis of the batched forest is split into
contiguous slabs across the ``model`` mesh axis; every device owns

* its node-feature slab ``h[:, k·S:(k+1)·S, :]`` — per-device feature
  memory is ``N/K`` of the full tensor plus the ``K·Hp`` halo buffer
  (vs. fully replicated features in
  ``edge_partition.partitioned_aggregate``).  Since round 5 this holds
  through the whole GCN stack, not just inside the operator: the
  factored per-token transform runs sequence-parallel under halo
  (``ops.gcn_layers`` 2-D shard_map), so layer activations stay
  node-sharded end-to-end — audited on the v5e-8 scheduled HLO,
  docs/design.md §6b item 4 — and
* the edges whose *destination* lies in its slab, so scatter-adds are
  always local.

Edges whose *source* lives on another device need that node's features: the
halo.  A load-time plan (``build_halo_plan``) computes, per device pair
(j → k), the exact boundary-node list k needs from j, padded to a static
size, so the runtime exchange is ONE ``lax.all_to_all`` of only boundary
features over ICI — not a full-tensor ``psum``.  Local-source edges are
aggregated from the device's own slab with no dependency on the
collective; under ``xla_tpu_enable_async_all_to_all`` (set by
``parallel.train_step`` for halo mode — XLA:TPU lowers a2a synchronously
by default) the exchange becomes a start/done pair with the local
scatter-add scheduled INSIDE the window, verified on the v5e-8 scheduled
HLO by ``tools/aot_topology.py`` (docs/design.md §6b item 3); halo-source
edges are added when the exchange lands.

The replicate+psum path (``edge_partition.py``) is kept as the correctness
oracle; both are tested against the dense adjacency matmul.

Everything here is new TPU-native surface — the reference is strictly
single-device (reference ``train.py:93-94``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class HaloPlan:
    """Static-shape exchange plan for one batch of forests.

    All index arrays are in *local* coordinates.  ``requests[j, k, b, i]``
    is the i-th node (local to owner j) that device k needs from j for
    example b; the received feature lands at extended-buffer slot
    ``S + j·Hp + i`` on device k.
    """

    n_devices: int
    slab: int                 # S: nodes per device (node axis padded to K·S)
    halo_width: int           # Hp: per-pair request capacity
    requests: np.ndarray      # [K, K, B, Hp] int32 (sender-local node ids)
    request_mask: np.ndarray  # [K, K, B, Hp] bool
    local_dst: np.ndarray     # [K, B, El] int32 (slab-local destination)
    local_src: np.ndarray     # [K, B, El] int32 (slab-local source)
    local_mask: np.ndarray    # [K, B, El] bool
    halo_dst: np.ndarray      # [K, B, Eh] int32 (slab-local destination)
    halo_src: np.ndarray      # [K, B, Eh] int32 (extended-buffer source ≥ S)
    halo_mask: np.ndarray     # [K, B, Eh] bool
    # provenance: the ORIGINAL batch edge index e of each slot.  Lets the
    # runtime apply a per-edge [B, E] keep mask (stochastic edge dropout)
    # to the plan's l/h masks on device — the plan itself stays static.
    local_edge: np.ndarray    # [K, B, El] int32
    halo_edge: np.ndarray     # [K, B, Eh] int32


def _group_positions(codes: np.ndarray) -> tuple[np.ndarray, int]:
    """For SORTED group codes, the 0-based position of each element within
    its group and the largest group size (≥1 for empty input)."""
    m = codes.shape[0]
    if m == 0:
        return np.zeros(0, np.int64), 1
    starts = np.r_[0, np.nonzero(np.diff(codes))[0] + 1]
    sizes = np.diff(np.r_[starts, m])
    pos = np.arange(m, dtype=np.int64) - np.repeat(starts, sizes)
    return pos, int(sizes.max())


def build_halo_plan(
    edge_parent: np.ndarray,  # [B, E]
    edge_child: np.ndarray,   # [B, E]
    edge_mask: np.ndarray,    # [B, E]
    n: int,
    n_devices: int,
    reverse: bool = False,
    pad_to: tuple[int, int, int] | None = None,
) -> HaloPlan:
    """Load-time (host) partitioning of a batched edge list.

    ``reverse=False`` plans ``A_f @ h`` (messages child→parent: destination
    = parent); ``reverse=True`` plans ``A_fᵀ @ h``.  Fully vectorized numpy
    (grouped cumcounts over the flattened masked-edge list — no Python
    loop over edges): ~100× the per-edge-loop formulation this replaced,
    so plan build stays far below step time even when training batches
    re-materialize every epoch.  Bit-identical to the loop semantics
    (``tests/test_parallel.py`` pins it against the reference
    implementation): edge order within each (device, example) group and
    first-appearance request dedup order are preserved.

    ``pad_to=(hp, el, eh)`` pads the capacity dimensions to STATIC budgets
    so every batch of a bucket compiles to the same XLA program (the
    training path sets hp = slab — requests are deduped per source node,
    so a peer can never request more than one whole slab — and
    el = eh = E).
    """
    b_sz, _ = edge_parent.shape
    k = n_devices
    slab = -(-n // k)  # ceil: node axis conceptually padded to k*slab

    dst_all = (edge_child if reverse else edge_parent).astype(np.int64)
    src_all = (edge_parent if reverse else edge_child).astype(np.int64)

    b_idx, e_idx = np.nonzero(np.asarray(edge_mask, bool))
    dst = dst_all[b_idx, e_idx]
    src = src_all[b_idx, e_idx]
    kd = dst // slab
    ks = src // slab
    is_local = kd == ks

    # ---- local edges: per (kd, b) slots in edge order -------------------
    lk, lb = kd[is_local], b_idx[is_local]
    # stable sort by (kd, b) preserves the (b, e) traversal order within
    # each group — np.nonzero already emits row-major order
    lorder = np.argsort(lk * b_sz + lb, kind="stable")
    lpos, el = _group_positions((lk * b_sz + lb)[lorder])

    # ---- halo edges -----------------------------------------------------
    hks, hkd, hb = ks[~is_local], kd[~is_local], b_idx[~is_local]
    hdst_l = (dst - kd * slab)[~is_local]
    hsrc = src[~is_local]
    # request dedup per (ks, kd, b, src), position = first-appearance rank
    gq = (hks * k + hkd) * b_sz + hb                  # request group
    code = gq * (k * slab) + hsrc                     # group × source node
    _, uidx, uinv = np.unique(code, return_index=True, return_inverse=True)
    ugq = gq[uidx]
    uo = np.lexsort((uidx, ugq))                      # group, then 1st-seen
    upos_sorted, hp_data = _group_positions(ugq[uo])
    upos = np.empty(uidx.shape[0], np.int64)
    upos[uo] = upos_sorted
    edge_req_pos = upos[uinv]                         # per halo edge
    # per (kd, b) halo-edge slots in edge order
    horder = np.argsort(hkd * b_sz + hb, kind="stable")
    hpos, eh = _group_positions((hkd * b_sz + hb)[horder])

    hp = hp_data if uidx.shape[0] else 1
    if pad_to is not None:
        hp_b, el_b, eh_b = pad_to
        assert hp <= hp_b and el <= el_b and eh <= eh_b, (
            f"halo plan exceeds static budget: need ({hp},{el},{eh}) "
            f"> budget ({hp_b},{el_b},{eh_b})"
        )
        hp, el, eh = hp_b, el_b, eh_b

    req_arr = np.zeros((k, k, b_sz, hp), np.int32)
    req_mask = np.zeros((k, k, b_sz, hp), bool)
    if uidx.shape[0]:
        req_arr[hks[uidx], hkd[uidx], hb[uidx], upos] = (
            hsrc[uidx] - hks[uidx] * slab)
        req_mask[hks[uidx], hkd[uidx], hb[uidx], upos] = True

    l_dst = np.zeros((k, b_sz, el), np.int32)
    l_src = np.zeros((k, b_sz, el), np.int32)
    l_mask = np.zeros((k, b_sz, el), bool)
    l_edge = np.zeros((k, b_sz, el), np.int32)
    if lk.shape[0]:
        lko, lbo = lk[lorder], lb[lorder]
        l_dst[lko, lbo, lpos] = (dst - kd * slab)[is_local][lorder]
        l_src[lko, lbo, lpos] = (src - ks * slab)[is_local][lorder]
        l_mask[lko, lbo, lpos] = True
        l_edge[lko, lbo, lpos] = e_idx[is_local][lorder]

    h_dst = np.zeros((k, b_sz, eh), np.int32)
    h_src = np.zeros((k, b_sz, eh), np.int32)
    h_mask = np.zeros((k, b_sz, eh), bool)
    h_edge = np.zeros((k, b_sz, eh), np.int32)
    if hks.shape[0]:
        hko, hbo = hkd[horder], hb[horder]
        h_dst[hko, hbo, hpos] = hdst_l[horder]
        h_src[hko, hbo, hpos] = (slab + hks * hp + edge_req_pos)[horder]
        h_mask[hko, hbo, hpos] = True
        h_edge[hko, hbo, hpos] = e_idx[~is_local][horder]

    return HaloPlan(
        n_devices=k, slab=slab, halo_width=hp,
        requests=req_arr, request_mask=req_mask,
        local_dst=l_dst, local_src=l_src, local_mask=l_mask,
        halo_dst=h_dst, halo_src=h_src, halo_mask=h_mask,
        local_edge=l_edge, halo_edge=h_edge,
    )


def build_halo_plan_loop(
    edge_parent: np.ndarray,
    edge_child: np.ndarray,
    edge_mask: np.ndarray,
    n: int,
    n_devices: int,
    reverse: bool = False,
    pad_to: tuple[int, int, int] | None = None,
) -> HaloPlan:
    """Reference per-edge-loop formulation of ``build_halo_plan`` — the
    semantics spec the vectorized builder is pinned against in
    ``tests/test_parallel.py``.  O(B·E) Python; not on the training path."""
    b_sz, _ = edge_parent.shape
    k = n_devices
    slab = -(-n // k)

    dst_all = (edge_child if reverse else edge_parent).astype(np.int64)
    src_all = (edge_parent if reverse else edge_child).astype(np.int64)

    requests: dict[tuple[int, int, int], list[int]] = {}
    req_pos: dict[tuple[int, int, int, int], int] = {}
    local: list[list[list[tuple[int, int, int]]]] = [
        [[] for _ in range(b_sz)] for _ in range(k)
    ]
    halo: list[list[list[tuple[int, int, int, int]]]] = [
        [[] for _ in range(b_sz)] for _ in range(k)
    ]
    for b in range(b_sz):
        for e in range(edge_parent.shape[1]):
            if not edge_mask[b, e]:
                continue
            dst = int(dst_all[b, e])
            src = int(src_all[b, e])
            kd, ks = dst // slab, src // slab
            if ks == kd:
                local[kd][b].append((dst - kd * slab, src - ks * slab, e))
            else:
                key = (ks, kd, b, src)
                if key not in req_pos:
                    lst = requests.setdefault((ks, kd, b), [])
                    req_pos[key] = len(lst)
                    lst.append(src - ks * slab)
                halo[kd][b].append((dst - kd * slab, ks, req_pos[key], e))

    hp = max([len(v) for v in requests.values()] + [1])
    el = max([len(x) for dev in local for x in dev] + [1])
    eh = max([len(x) for dev in halo for x in dev] + [1])
    if pad_to is not None:
        hp_b, el_b, eh_b = pad_to
        assert hp <= hp_b and el <= el_b and eh <= eh_b, (
            f"halo plan exceeds static budget: need ({hp},{el},{eh}) "
            f"> budget ({hp_b},{el_b},{eh_b})"
        )
        hp, el, eh = hp_b, el_b, eh_b

    req_arr = np.zeros((k, k, b_sz, hp), np.int32)
    req_mask = np.zeros((k, k, b_sz, hp), bool)
    for (ks, kd, b), lst in requests.items():
        req_arr[ks, kd, b, : len(lst)] = lst
        req_mask[ks, kd, b, : len(lst)] = True

    l_dst = np.zeros((k, b_sz, el), np.int32)
    l_src = np.zeros((k, b_sz, el), np.int32)
    l_mask = np.zeros((k, b_sz, el), bool)
    l_edge = np.zeros((k, b_sz, el), np.int32)
    h_dst = np.zeros((k, b_sz, eh), np.int32)
    h_src = np.zeros((k, b_sz, eh), np.int32)
    h_mask = np.zeros((k, b_sz, eh), bool)
    h_edge = np.zeros((k, b_sz, eh), np.int32)
    for kd in range(k):
        for b in range(b_sz):
            for i, (d, s, e) in enumerate(local[kd][b]):
                l_dst[kd, b, i], l_src[kd, b, i] = d, s
                l_mask[kd, b, i] = True
                l_edge[kd, b, i] = e
            for i, (d, ks, pos, e) in enumerate(halo[kd][b]):
                h_dst[kd, b, i] = d
                h_src[kd, b, i] = slab + ks * hp + pos
                h_mask[kd, b, i] = True
                h_edge[kd, b, i] = e

    return HaloPlan(
        n_devices=k, slab=slab, halo_width=hp,
        requests=req_arr, request_mask=req_mask,
        local_dst=l_dst, local_src=l_src, local_mask=l_mask,
        halo_dst=h_dst, halo_src=h_src, halo_mask=h_mask,
        local_edge=l_edge, halo_edge=h_edge,
    )


def _scatter_local(h_ext, dst, src, mask, slab):
    """out[b, dst] += h_ext[b, src] for masked edges; out is [B, slab, H]."""
    b = h_ext.shape[0]
    msgs = jnp.take_along_axis(
        h_ext, src[:, :, None].astype(jnp.int32), axis=1
    )
    msgs = msgs * mask[:, :, None].astype(h_ext.dtype)
    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None],
                            dst.shape)
    out = jnp.zeros((b, slab, h_ext.shape[-1]), h_ext.dtype)
    return out.at[bidx, dst].add(msgs, mode="drop")


def _checksum_guard(sent_sum, recv_sum):
    """Host-side assertion that the exchanged-feature checksums agree."""
    if not np.allclose(sent_sum, recv_sum, rtol=1e-5, atol=1e-5):
        raise FloatingPointError(
            f"halo-exchange checksum mismatch: sent {sent_sum!r} != "
            f"received {recv_sum!r} — boundary features were corrupted "
            "in transit (SURVEY §5 cross-host checksum sanitizer)"
        )


def halo_aggregate(
    mesh: Mesh,
    h: jax.Array,             # [B, K·S, H] node features, sharded on nodes
    plan: HaloPlan,
    axis: str = "model",
    debug_checksum: bool = False,
    data_axis: str | None = None,
) -> jax.Array:
    """Sparse aggregation with node-sharded features + halo exchange.

    Returns the same [B, K·S, H] node-sharded layout.  Communication is one
    ``all_to_all`` of [K, B, Hp, H] boundary features; per-device live
    feature memory is ``B·(S + K·Hp)·H``.

    Plan arrays may be host numpy (standalone use) or traced jax arrays
    (the training path ships them in the batch dict — see
    ``attach_halo_plans``); all static sizes derive from their shapes.
    ``data_axis`` co-shards the batch dimension so the operator composes
    with data parallelism on a (data × model) mesh — plans are
    per-example, so splitting B is exact.

    ``debug_checksum=True`` adds the SURVEY §5 cross-host sanitizer: the
    ``all_to_all`` permutes boundary features across devices, so the
    psum-reduced checksum of everything sent must equal the checksum of
    everything received; a mismatch (transport corruption, a bad exchange
    plan) raises ``FloatingPointError`` from a host callback.  Debug only —
    it forces an extra all-reduce and a host sync.
    """
    return halo_aggregate_arrays(
        mesh, h, plan.requests, plan.request_mask,
        plan.local_dst, plan.local_src, plan.local_mask,
        plan.halo_dst, plan.halo_src, plan.halo_mask,
        axis=axis, debug_checksum=debug_checksum, data_axis=data_axis,
    )


def halo_aggregate_arrays(
    mesh: Mesh,
    h: jax.Array,
    requests, request_mask,          # [K, K, B, Hp]
    local_dst, local_src, local_mask,  # [K, B, El]
    halo_dst, halo_src, halo_mask,     # [K, B, Eh]
    axis: str = "model",
    debug_checksum: bool = False,
    data_axis: str | None = None,
) -> jax.Array:
    """`halo_aggregate` over raw plan arrays (numpy or traced)."""
    k = int(requests.shape[0])
    hp = int(requests.shape[3])
    assert mesh.shape[axis] == k, (mesh.shape, k)
    assert h.shape[1] % k == 0, (h.shape, k)
    slab = h.shape[1] // k

    reqs = jnp.asarray(requests)
    reqm = jnp.asarray(request_mask)
    args = [jnp.asarray(a) for a in (
        local_dst, local_src, local_mask,
        halo_dst, halo_src, halo_mask,
    )]
    da = data_axis if (
        data_axis is not None and dict(mesh.shape).get(data_axis, 1) > 1
    ) else None

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(da, axis, None),         # h: batch × nodes sharded
            P(axis, None, da),         # requests [K_owner, K, B, Hp]
            P(axis, None, da),
            P(axis, da), P(axis, da), P(axis, da),  # local edges [K, B, El]
            P(axis, da), P(axis, da), P(axis, da),  # halo edges  [K, B, Eh]
        ),
        out_specs=P(da, axis, None),
        check_vma=False,
    )
    def run(h_own, req, req_mask, l_dst, l_src, l_mask, h_dst, h_src,
            h_mask):
        # h_own: [B, S, H]; req: [1, K, B, Hp] (what each peer needs from me)
        req = req[0]
        req_mask = req_mask[0]
        # [K, B, Hp, H]: gather my boundary nodes for each peer
        idx = req[..., None]                     # [K, B, Hp, 1]
        out_sends = jnp.take_along_axis(h_own[None], idx, axis=2)
        out_sends = out_sends * req_mask[..., None].astype(out_sends.dtype)
        # one boundary-feature exchange over ICI
        halo_feats = jax.lax.all_to_all(
            out_sends, axis, split_axis=0, concat_axis=0, tiled=False
        )  # [K, B, Hp, H]; row j = features from peer j, in my request order
        if debug_checksum:
            sent = jax.lax.psum(
                jnp.sum(out_sends.astype(jnp.float32)), axis
            )
            recv = jax.lax.psum(
                jnp.sum(halo_feats.astype(jnp.float32)), axis
            )
            jax.debug.callback(_checksum_guard, sent, recv)
        # local-source edges: no dependency on the collective — XLA overlaps
        out = _scatter_local(h_own, l_dst[0], l_src[0], l_mask[0], slab)
        # extended buffer: own slab ++ halo (slot S + j·Hp + i)
        h_ext = jnp.concatenate(
            [h_own, jnp.moveaxis(halo_feats, 0, 1).reshape(
                h_own.shape[0], k * hp, h_own.shape[-1]
            )], axis=1,
        )
        out = out + _scatter_local(
            h_ext, h_dst[0], h_src[0], h_mask[0], slab
        )
        return out

    return run(h, reqs, reqm, *args)


def halo_aggregate_pair_arrays(
    mesh: Mesh,
    x_f: jax.Array,                    # [B, K·S, H] forward-band features
    x_r: jax.Array,                    # [B, K·S, H] reverse-band features
    arrs_f: tuple,                     # forward plan, plans_from_batch order
    arrs_r: tuple,                     # reverse plan, plans_from_batch order
    axis: str = "model",
    debug_checksum: bool = False,
    data_axis: str | None = None,
) -> jax.Array:
    """``A_f @ x_f + A_fᵀ @ x_r`` with ONE boundary exchange.

    Every aggregation call site sums the forward and reverse bands (they
    share the same node sharding), so running them as two
    ``halo_aggregate_arrays`` calls pays two ``all_to_all``s per layer.
    This fuses them: both bands' boundary features are gathered into one
    [K, B, Hp_f + Hp_r, H] buffer and exchanged in a single
    ``all_to_all`` — halving the per-layer collective count (and its
    latency-bound cost at flagship halo sizes) without changing any
    indexing: the received buffer is split back at Hp_f and each band
    scatters exactly as in the single-band operator.
    """
    k = int(arrs_f[0].shape[0])
    hp_f = int(arrs_f[0].shape[3])
    hp_r = int(arrs_r[0].shape[3])
    assert mesh.shape[axis] == k, (mesh.shape, k)
    assert x_f.shape == x_r.shape and x_f.shape[1] % k == 0, (
        x_f.shape, x_r.shape, k)
    slab = x_f.shape[1] // k

    af = [jnp.asarray(a) for a in arrs_f]
    ar = [jnp.asarray(a) for a in arrs_r]
    da = data_axis if (
        data_axis is not None and dict(mesh.shape).get(data_axis, 1) > 1
    ) else None

    plan_specs = (
        P(axis, None, da, None), P(axis, None, da, None),
        P(axis, da), P(axis, da), P(axis, da),
        P(axis, da), P(axis, da), P(axis, da),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(da, axis, None), P(da, axis, None),
                  *plan_specs, *plan_specs),
        out_specs=P(da, axis, None),
        check_vma=False,
    )
    def run(xf_own, xr_own,
            req_f, reqm_f, ldst_f, lsrc_f, lmask_f, hdst_f, hsrc_f, hmask_f,
            req_r, reqm_r, ldst_r, lsrc_r, lmask_r, hdst_r, hsrc_r, hmask_r):
        def gather_sends(h_own, req, req_mask):
            idx = req[0][..., None]                  # [K, B, Hp, 1]
            s = jnp.take_along_axis(h_own[None], idx, axis=2)
            return s * req_mask[0][..., None].astype(s.dtype)

        sends = jnp.concatenate(
            [gather_sends(xf_own, req_f, reqm_f),
             gather_sends(xr_own, req_r, reqm_r)], axis=2,
        )  # [K, B, Hp_f + Hp_r, H]
        halo_feats = jax.lax.all_to_all(
            sends, axis, split_axis=0, concat_axis=0, tiled=False
        )
        if debug_checksum:
            sent = jax.lax.psum(jnp.sum(sends.astype(jnp.float32)), axis)
            recv = jax.lax.psum(
                jnp.sum(halo_feats.astype(jnp.float32)), axis)
            jax.debug.callback(_checksum_guard, sent, recv)

        def band(h_own, halo_band, hp, ldst, lsrc, lmask, hdst, hsrc,
                 hmask):
            out = _scatter_local(h_own, ldst[0], lsrc[0], lmask[0], slab)
            h_ext = jnp.concatenate(
                [h_own, jnp.moveaxis(halo_band, 0, 1).reshape(
                    h_own.shape[0], k * hp, h_own.shape[-1])], axis=1,
            )
            return out + _scatter_local(
                h_ext, hdst[0], hsrc[0], hmask[0], slab)

        return (
            band(xf_own, halo_feats[:, :, :hp_f], hp_f,
                 ldst_f, lsrc_f, lmask_f, hdst_f, hsrc_f, hmask_f)
            + band(xr_own, halo_feats[:, :, hp_f:], hp_r,
                   ldst_r, lsrc_r, lmask_r, hdst_r, hsrc_r, hmask_r)
        )

    return run(x_f, x_r, *af, *ar)


def halo_attention_pair_arrays(
    mesh: Mesh,
    q: jax.Array,                      # [B, K·S, Dk] dst queries (scaled)
    kv: jax.Array,                     # [B, K·S, Dk+H] concat(k, msgs)
    dk: int,
    arrs_f: tuple,                     # forward plan, plans_from_batch order
    arrs_r: tuple,                     # reverse plan
    axis: str = "model",
    data_axis: str | None = None,
) -> jax.Array:
    """Edge-attention aggregation (``adj_type=attention``) with
    node-sharded features and ONE boundary exchange for both bands.

    The halo plan assigns every edge to its DESTINATION's device, so the
    per-destination edge softmax (``ops.pallas.sddmm.edge_softmax``
    semantics) is device-local once the boundary sources' ``k`` and
    message features arrive: scores ``q_own[dst]·k_ext[src]``, per-dst
    max/denominator via local scatter-max/add over the dst slab, weighted
    scatter of ``v_ext[src]``.  Both bands' ``concat(k, v)`` boundary
    features ride a single stacked ``all_to_all`` — the same one-
    exchange-per-layer structure as ``halo_aggregate_pair_arrays``.
    ``q`` must be pre-scaled (``q @ Wq / sqrt(dk)``); returns the summed
    fwd+rev band aggregate, node-sharded ``[B, K·S, H]``.

    The reference has no working attention at all (its ``--deprel_attn``
    path is dead code, reference ``model/gcn.py:199-227``), let alone a
    partitioned one.
    """
    k = int(arrs_f[0].shape[0])
    hp_f = int(arrs_f[0].shape[3])
    hp_r = int(arrs_r[0].shape[3])
    assert mesh.shape[axis] == k, (mesh.shape, k)
    assert q.shape[:2] == kv.shape[:2] and q.shape[1] % k == 0, (
        q.shape, kv.shape, k)
    slab = q.shape[1] // k

    af = [jnp.asarray(a) for a in arrs_f]
    ar = [jnp.asarray(a) for a in arrs_r]
    da = data_axis if (
        data_axis is not None and dict(mesh.shape).get(data_axis, 1) > 1
    ) else None

    plan_specs = (
        P(axis, None, da, None), P(axis, None, da, None),
        P(axis, da), P(axis, da), P(axis, da),
        P(axis, da), P(axis, da), P(axis, da),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(da, axis, None), P(da, axis, None),
                  *plan_specs, *plan_specs),
        out_specs=P(da, axis, None),
        check_vma=False,
    )
    def run(q_own, kv_own,
            req_f, reqm_f, ldst_f, lsrc_f, lmask_f, hdst_f, hsrc_f, hmask_f,
            req_r, reqm_r, ldst_r, lsrc_r, lmask_r, hdst_r, hsrc_r, hmask_r):
        def gather_sends(req, req_mask):
            idx = req[0][..., None]                  # [K, B, Hp, 1]
            s = jnp.take_along_axis(kv_own[None], idx, axis=2)
            return s * req_mask[0][..., None].astype(s.dtype)

        sends = jnp.concatenate(
            [gather_sends(req_f, reqm_f), gather_sends(req_r, reqm_r)],
            axis=2,
        )  # [K, B, Hp_f + Hp_r, Dk+H]
        halo_feats = jax.lax.all_to_all(
            sends, axis, split_axis=0, concat_axis=0, tiled=False
        )

        b_sz = q_own.shape[0]
        bidx1 = jnp.arange(b_sz, dtype=jnp.int32)[:, None]

        def band(halo_band, hp, ldst, lsrc, lmask, hdst, hsrc, hmask):
            kv_ext = jnp.concatenate(
                [kv_own, jnp.moveaxis(halo_band, 0, 1).reshape(
                    b_sz, k * hp, kv_own.shape[-1])], axis=1,
            )
            # all slots of this band: local then halo, dst slab-local
            dst = jnp.concatenate([ldst[0], hdst[0]], axis=1)  # [B, E*]
            src = jnp.concatenate([lsrc[0], hsrc[0]], axis=1)
            msk = jnp.concatenate([lmask[0], hmask[0]], axis=1)
            src3 = src[:, :, None].astype(jnp.int32)
            q_slot = jnp.take_along_axis(
                q_own, dst[:, :, None].astype(jnp.int32), axis=1)
            k_slot = jnp.take_along_axis(kv_ext[..., :dk], src3, axis=1)
            s = jnp.sum(
                q_slot.astype(jnp.float32) * k_slot.astype(jnp.float32),
                axis=-1)                                       # [B, E*]
            # per-destination softmax, ops.pallas.sddmm.edge_softmax
            # formula verbatim (same neg/eps constants for parity)
            neg = jnp.asarray(-1e30, s.dtype)
            masked = jnp.where(msk, s, neg)
            dmax = jnp.full((b_sz, slab), neg, s.dtype).at[
                bidx1, dst].max(masked, mode="drop")
            shifted = masked - jnp.take_along_axis(
                dmax, dst.astype(jnp.int32), axis=1)
            ex = jnp.where(msk, jnp.exp(shifted), jnp.zeros((), s.dtype))
            den = jnp.zeros((b_sz, slab), s.dtype).at[bidx1, dst].add(
                ex, mode="drop")
            den_e = jnp.take_along_axis(den, dst.astype(jnp.int32), axis=1)
            alpha = ex / jnp.maximum(den_e, 1e-30)
            v_slot = jnp.take_along_axis(kv_ext[..., dk:], src3, axis=1)
            msgs = v_slot * alpha[:, :, None].astype(v_slot.dtype)
            out = jnp.zeros((b_sz, slab, v_slot.shape[-1]), v_slot.dtype)
            bidx2 = jnp.broadcast_to(
                jnp.arange(b_sz, dtype=jnp.int32)[:, None], dst.shape)
            return out.at[bidx2, dst].add(msgs, mode="drop")

        return (
            band(halo_feats[:, :, :hp_f], hp_f,
                 ldst_f, lsrc_f, lmask_f, hdst_f, hsrc_f, hmask_f)
            + band(halo_feats[:, :, hp_f:], hp_r,
                   ldst_r, lsrc_r, lmask_r, hdst_r, hsrc_r, hmask_r)
        )

    return run(q, kv, *af, *ar)


# ------------------------------------------------------- batch integration
# The training path ships halo plans inside the batch dict as plain arrays
# (they must be TRACED jit inputs — closure-captured numpy constants would
# bake the first batch's plan into the compiled program).  Keys:
# ``hplan_{f,r}_{req,reqm,ldst,lsrc,lmask,hdst,hsrc,hmask}`` for the
# forward (A_f @ x) and reverse (A_fᵀ @ x) bands, plus the edge-provenance
# slots ``hplan_{f,r}_{ledge,hedge}`` (for on-device edge dropout).

_PLAN_FIELDS = (
    ("req", "requests"), ("reqm", "request_mask"),
    ("ldst", "local_dst"), ("lsrc", "local_src"), ("lmask", "local_mask"),
    ("hdst", "halo_dst"), ("hsrc", "halo_src"), ("hmask", "halo_mask"),
)

# shipped alongside, NOT part of halo_aggregate_arrays' argument list
_EDGE_SLOT_FIELDS = (("ledge", "local_edge"), ("hedge", "halo_edge"))


def is_plan_key(key: str) -> bool:
    return key.startswith("hplan_")


def plan_spec(key: str, ndim: int, axis: str = "model",
              data_axis: str | None = "data"):
    """PartitionSpec for one plan array in a sharded batch: device dim on
    the ``model`` axis, batch dim on ``data`` (matching
    ``halo_aggregate_arrays``'s in_specs)."""
    if ndim == 4:   # requests / request_mask [K, K, B, Hp]
        return P(axis, None, data_axis, None)
    return P(axis, data_axis, None)  # [K, B, E]


def attach_halo_plans(batch: dict, n: int, n_devices: int) -> dict:
    """Build static-shape fwd+rev halo plans for one host batch and return
    the batch extended with the ``hplan_*`` arrays.

    Static budgets (identical for every batch of a bucket, so XLA compiles
    one program per bucket): per-pair request capacity = slab (requests
    are source-deduped, so a peer can never need more than one whole
    slab), local/halo edge capacity = E (the batch's edge budget).
    """
    k = n_devices
    slab = -(-n // k)
    e_cap = int(batch["edge_parent"].shape[1])
    out = dict(batch)
    for tag, reverse in (("f", False), ("r", True)):
        plan = build_halo_plan(
            np.asarray(batch["edge_parent"]),
            np.asarray(batch["edge_child"]),
            np.asarray(batch["edge_mask"]),
            n, k, reverse=reverse, pad_to=(slab, e_cap, e_cap),
        )
        for short, field in _PLAN_FIELDS + _EDGE_SLOT_FIELDS:
            out[f"hplan_{tag}_{short}"] = getattr(plan, field)
    return out


def plans_from_batch(batch: dict, tag: str):
    """The 8 plan arrays for one band ('f' or 'r'), in
    ``halo_aggregate_arrays`` argument order."""
    return tuple(batch[f"hplan_{tag}_{short}"] for short, _ in _PLAN_FIELDS)


def edge_slots_from_batch(batch: dict, tag: str):
    """The (local_edge, halo_edge) provenance arrays for one band — maps a
    per-edge [B, E] keep mask onto the plan's slot masks for on-device
    stochastic edge dropout (`GCNClassifier._part_agg*`)."""
    return (batch[f"hplan_{tag}_ledge"], batch[f"hplan_{tag}_hedge"])


def masks_with_edge_keep(arrs: tuple, slots: tuple, edge_keep) -> tuple:
    """Plan arrays with the slot masks ANDed against a per-edge [B, E]
    keep mask (drop = False).  Indexing happens in the REPLICATED [K,...]
    layout before shard_map, so it composes with any mesh."""
    l_edge, h_edge = slots
    (req, reqm, ldst, lsrc, lmask, hdst, hsrc, hmask) = arrs
    b_ix = jnp.arange(edge_keep.shape[0], dtype=jnp.int32)[None, :, None]
    lmask = lmask & edge_keep[b_ix, l_edge]
    hmask = hmask & edge_keep[b_ix, h_edge]
    return (req, reqm, ldst, lsrc, lmask, hdst, hsrc, hmask)


def pad_nodes_for_axis(h: jax.Array, n_devices: int) -> jax.Array:
    """Pad the node axis so it divides the mesh axis size."""
    n = h.shape[1]
    slab = -(-n // n_devices)
    pad = slab * n_devices - n
    if pad == 0:
        return h
    return jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
