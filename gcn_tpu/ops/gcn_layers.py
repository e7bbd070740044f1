"""Dense-XLA GCN aggregation — the three ``adj_type`` modes.

These are the *reference implementations* of the aggregation math (exact
parity with ``model/gcn.py:266-393``), expressed as batched matmuls that XLA
tiles straight onto the MXU.  The Pallas kernels in
``gcn_tpu.ops.deprel_pallas`` / ``spmm_pallas`` are drop-in replacements for
the hot paths, allclose-tested against these.

All functions take pre-built band matrices (``gcn_tpu.ops.adjacency``) and
return the *un-normalized* layer output; the caller divides by ``denom`` and
applies ReLU + dropout (mirroring the reference layer-loop structure at
``model/gcn.py:390-393``).

Shapes:  h [B,N,T], bands [B,N,N], W [T,H], deprel embs [B,N,D].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def regular_layer(
    h: jax.Array,
    adj_combined: jax.Array,
    w: jax.Array,
    b: jax.Array,
    no_adj: bool = False,
) -> jax.Array:
    """``W(A h) + W(h)`` with the fused form ``((A+I) h) W + 2b``
    (reference ``model/gcn.py:267-271``).  ``no_adj`` zeroes only the
    neighbor sum (the ablation at ``model/gcn.py:264-265`` — the denominator
    keeps the true degrees)."""
    if no_adj:
        ax = h
    else:
        ax = jnp.matmul(adj_combined, h) + h
    return jnp.matmul(ax, w) + 2.0 * b


def diagonal_deprel_layer(
    h: jax.Array,
    adj_forward: jax.Array,
    e_fwd: jax.Array,
    e_rev: jax.Array,
    e_self: jax.Array,
) -> jax.Array:
    """Element-wise deprel gating (reference ``model/gcn.py:272-294``):
    ``A_f (e_fwd ⊙ h) + A_fᵀ (e_rev ⊙ h) + e_self ⊙ h``.

    Note the reference indexes the *reverse* gate by the message-sender
    column of the reverse band — i.e. by the parent token's own deprel id
    (+42), not the edge's deprel; ``e_rev`` must be built accordingly.
    """
    fwd = jnp.matmul(adj_forward, e_fwd * h)
    rev = jnp.matmul(jnp.swapaxes(adj_forward, 1, 2), e_rev * h)
    return fwd + rev + e_self * h


def compose_relation_transforms(
    table: jax.Array,  # [R, D] deprel embedding rows (possibly augmented)
    w: jax.Array,      # [D, T, H]
    b: jax.Array,      # [D, H]
) -> tuple[jax.Array, jax.Array]:
    """Per-relation composed transforms ``S[r] = Σ_d table[r,d]·W[d]`` and
    ``bias[r] = table[r] @ b``.

    The key algebraic identity behind the factored full_deprel path: the
    reference's per-token bilinear transform (``model/gcn.py:400-415``)

        out[m] = Σ_d e[m,d] · (h[m] @ W[d] + b[d]),   e = table[ids]

    is linear in ``e``, so it equals ``h[m] @ S[ids[m]] + bias[ids[m]]``.
    Composing S costs ``2·R·D·T·H`` FLOPs ONCE per step (≈1.4 GFLOP at
    flagship shapes) instead of ``2·M·D·T·H`` per token (≈38 GFLOP) — a
    ~25× FLOP reduction of the model's dominant contraction, and the
    ``[M, D·T]`` outer-product intermediate never exists.
    """
    s = jnp.einsum("rd,dth->rth", table, w)
    return s, table @ b


@jax.custom_vjp
def permute_rows(x: jax.Array, perm: jax.Array,
                 inv_perm: jax.Array) -> jax.Array:
    """``x[perm]`` with a gather-only VJP.

    XLA cannot know ``perm`` is a permutation, so autodiff of a plain
    ``take`` emits a scatter-ADD — slow on TPU.  With the inverse
    permutation in hand, the cotangent is just the opposite gather."""
    return jnp.take(x, perm, axis=0)


def _permute_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), (perm, inv_perm)


def _permute_bwd(res, g):
    perm, inv_perm = res
    return jnp.take(g, inv_perm, axis=0), None, None


permute_rows.defvjp(_permute_fwd, _permute_bwd)


def _plan_local(flat: jax.Array, n_groups: int):
    perm = jnp.argsort(flat)
    inv_perm = jnp.argsort(perm)
    onehot = jax.nn.one_hot(flat, n_groups, dtype=jnp.bfloat16)
    group_sizes = onehot.sum(axis=0).astype(jnp.int32)
    return perm, inv_perm, group_sizes, onehot


def _node_sharded_ctx(b_sz: int, n: int):
    """(mesh, da, ma) when halo graph-partitioning is active and the
    [B, N] grid divides the (data × model) mesh — the sequence-parallel
    regime: the grouped transform runs per node-slab shard, so layer
    activations stay node-sharded end-to-end (no inter-layer [B, N, H]
    all-gather between the per-token transform and the halo aggregation;
    identified by the AOT topology audit, design.md §6b item 4)."""
    from gcn_tpu.utils.shard_ctx import active_partition

    part = active_partition()
    if part is None or part[0] != "halo":
        return None
    _, mesh, ma, da = part
    sizes = dict(mesh.shape)
    k = sizes.get(ma, 1)
    d = sizes.get(da, 1) if da is not None else 1
    if k <= 1 or n % k != 0 or b_sz % max(d, 1) != 0:
        return None
    return mesh, da, ma


def make_group_plan(ids: jax.Array, n_groups: int):
    """Sort plan for ``grouped_bilinear``: (perm, inv_perm, group_sizes,
    onehot) over flattened token ids.  Reusable across calls whose ids are
    identical (e.g. every GCN layer when deprel forgetting is off).

    ``onehot`` [M, R] doubles as (a) the bias-gather matmul operand — its
    transpose-matmul backward keeps the bias gradient on the MXU instead
    of a scatter-add — and (b) the source of ``group_sizes`` (a reduce,
    not a bincount scatter).

    Under an active ``shard_ctx.local_grouping`` mesh the plan is built
    *per data shard* inside ``shard_map`` (grouping is row-local math, so
    a global sort would only burn ICI bandwidth): ``perm``/``inv_perm``
    hold shard-local row indices and ``group_sizes`` stacks the per-shard
    [R] counts — consumed with the same specs by ``grouped_bilinear``."""
    from gcn_tpu.utils.shard_ctx import active_grouping

    # sequence-parallel (node-sharded) plan under halo partitioning:
    # each (data, node-slab) shard sorts/groups its OWN [B_l, N_l] grid.
    # Outputs keep the [B, N] shape (perm/inv hold shard-LOCAL flat row
    # indices; group_sizes comes back [D, K, R]) so grouped_bilinear can
    # consume them with the identical 2-D sharding — detected there by
    # ``perm.ndim == 2``.
    ctx2 = (_node_sharded_ctx(ids.shape[0], ids.shape[1])
            if ids.ndim == 2 else None)
    if ctx2 is not None:
        mesh, da, ma = ctx2
        from jax.sharding import PartitionSpec as P

        def body2(ids_l):
            b_l, n_l = ids_l.shape
            perm, inv, gs, oh = _plan_local(
                ids_l.reshape(-1).astype(jnp.int32), n_groups)
            return (perm.reshape(b_l, n_l), inv.reshape(b_l, n_l),
                    gs[None, None, :], oh.reshape(b_l, n_l, n_groups))

        return jax.shard_map(
            body2,
            mesh=mesh,
            in_specs=P(da, ma),
            out_specs=(P(da, ma), P(da, ma), P(da, ma, None),
                       P(da, ma, None)),
            check_vma=False,
        )(ids)

    flat = ids.reshape(-1).astype(jnp.int32)
    ctx = active_grouping()
    if ctx is None or flat.shape[0] % dict(ctx[0].shape)[ctx[1]] != 0:
        return _plan_local(flat, n_groups)
    mesh, da, _ = ctx
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        lambda f: _plan_local(f, n_groups),
        mesh=mesh,
        in_specs=P(da),
        out_specs=(P(da), P(da), P(da), P(da, None)),
        check_vma=False,
    )(flat)


def grouped_bilinear(
    h: jax.Array,    # [B, N, T]
    ids: jax.Array,  # [B, N] int32 relation ids in [0, R)
    s: jax.Array,    # [R, T, H] composed per-relation matrices
    bs: jax.Array,   # [R, H] composed per-relation biases
    impl: str = "auto",
    plan=None,
) -> jax.Array:
    """``out[b,n] = h[b,n] @ S[ids[b,n]] + bias[ids[b,n]]`` as a grouped
    (ragged) matmul: sort tokens by relation id, one grouped matmul over
    the R contiguous groups, un-sort.  The plumbing is gather-only in both
    directions (``permute_rows``) — O(M·T) data movement, negligible next
    to the matmul it replaces.

    ``impl``: "ragged" = ``lax.ragged_dot``; "pallas" = the MoE-style
    visit-scheduled kernel (``ops.pallas.grouped_matmul``) with a fused
    dx+dS backward; "auto" = pallas on TPU, ragged elsewhere.
    ``plan``: precomputed ``make_group_plan(ids, R)`` to share the sort
    across calls with identical ids.

    Under an active ``shard_ctx.local_grouping`` mesh the whole
    sort → grouped-matmul → un-sort runs inside ``shard_map`` over the
    data axis with **zero collectives** in the forward (each shard groups
    its own rows; the math is row-local so placement is irrelevant), and
    the composed matrices shard their H dim over the model axis when it
    divides (matching ``mesh.param_shardings`` on the bilinear weight)."""
    from gcn_tpu.utils.shard_ctx import active_grouping

    b_sz, n, t = h.shape
    m = b_sz * n
    if plan is None:
        plan = make_group_plan(ids, s.shape[0])
    perm, inv_perm, group_sizes, onehot = plan
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "ragged"
    if perm.ndim == 2:
        # sequence-parallel plan (make_group_plan's node-sharded path):
        # run the row-local core per (data, node-slab) shard.  h stays
        # [B, N, T] with nodes sharded on the model axis — the flatten
        # happens INSIDE shard_map, so no cross-slab gather ever occurs
        # and the output lands exactly in the halo operator's layout.
        # The composed matrices are replicated here (node sharding and
        # H sharding over the same axis are mutually exclusive).
        ctx2 = _node_sharded_ctx(b_sz, n)
        assert ctx2 is not None, "2-D group plan outside halo context"
        mesh2, da2, ma2 = ctx2
        from jax.sharding import PartitionSpec as P

        def body2(h_l, perm_l, inv_l, gs_l, oh_l, s_, bs_):
            b_l, n_l, t_ = h_l.shape
            out = _grouped_core(
                h_l.reshape(b_l * n_l, t_), perm_l.reshape(-1),
                inv_l.reshape(-1), gs_l[0, 0],
                oh_l.reshape(b_l * n_l, -1), s_, bs_, impl=impl)
            return out.reshape(b_l, n_l, -1)

        return jax.shard_map(
            body2,
            mesh=mesh2,
            in_specs=(P(da2, ma2, None), P(da2, ma2), P(da2, ma2),
                      P(da2, ma2, None), P(da2, ma2, None),
                      P(None, None, None), P(None, None)),
            out_specs=P(da2, ma2, None),
            check_vma=False,
        )(h, perm, inv_perm, group_sizes, onehot, s, bs)
    h2 = h.reshape(m, t)
    ctx = active_grouping()
    if ctx is not None and m % dict(ctx[0].shape)[ctx[1]] != 0:
        ctx = None  # mirrors make_group_plan's fallback for ragged batches
    if ctx is None:
        out = _grouped_core(h2, perm, inv_perm, group_sizes, onehot, s, bs,
                            impl=impl)
    else:
        mesh, da, ma = ctx
        from jax.sharding import PartitionSpec as P

        shard_h = (
            ma is not None
            and dict(mesh.shape).get(ma, 1) > 1
            and s.shape[-1] % mesh.shape[ma] == 0
        )
        h_ax = ma if shard_h else None
        out = jax.shard_map(
            partial(_grouped_core, impl=impl),
            mesh=mesh,
            in_specs=(P(da, None), P(da), P(da), P(da), P(da, None),
                      P(None, None, h_ax), P(None, h_ax)),
            out_specs=P(da, h_ax),
            check_vma=False,
        )(h2, perm, inv_perm, group_sizes, onehot, s, bs)
    return out.reshape(b_sz, n, s.shape[-1])


def _grouped_core(h2, perm, inv_perm, group_sizes, onehot, s, bs,
                  impl: str):
    """sort → grouped matmul → un-sort → +bias over [M, T] rows.

    Row-local: runs identically on the full batch (single device) or on
    one data shard's rows inside ``shard_map``."""
    h_sorted = permute_rows(h2, perm, inv_perm)
    if impl == "pallas":
        from gcn_tpu.ops.pallas.grouped_matmul import grouped_matmul

        out_sorted = grouped_matmul(h_sorted, s, group_sizes)
    else:
        out_sorted = jax.lax.ragged_dot(h_sorted, s, group_sizes)
    out = permute_rows(out_sorted, inv_perm, perm)
    # bias gather as a [M,R]@[R,H] matmul: backward becomes onehotᵀ@g on
    # the MXU instead of a scatter-add into the bias table
    return out + jnp.matmul(onehot.astype(out.dtype), bs.astype(out.dtype))


def bilinear_traverse(
    h: jax.Array,
    e: jax.Array,
    w: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Per-token deprel-conditioned bilinear transform
    (reference ``traverse_deprel``, ``model/gcn.py:400-415``):

      out[b,n,:] = Σ_d e[b,n,d] · (h[b,n,:] @ W[d] + bias[d])

    The reference materializes the [B,N,D,T] outer product
    (``model/gcn.py:410``); here the contraction order is left to XLA via a
    single 3-operand einsum (the Pallas kernel avoids the intermediate
    entirely).
    """
    out = jnp.einsum("bnd,bnt,dth->bnh", e, h, w)
    return out + jnp.einsum("bnd,dh->bnh", e, b)


def self_loop_traverse(
    h: jax.Array, e_self: jax.Array, w: jax.Array, b: jax.Array
) -> jax.Array:
    """Self-loop path of full_deprel (reference ``traverse_self_loop``,
    ``model/gcn.py:417-434``): collapse W over the deprel axis with the
    self-loop embedding, then one plain matmul."""
    sl_w = jnp.einsum("d,dth->th", e_self, w)
    sl_b = jnp.einsum("d,dh->h", e_self, b)
    return h @ sl_w + sl_b


def full_deprel_layer(
    h: jax.Array,
    adj_forward: jax.Array,
    e_fwd: jax.Array,
    e_rev: jax.Array | None,
    e_self: jax.Array | None,
    w: jax.Array,
    b: jax.Array,
    adj_reverse: jax.Array | None = None,
) -> jax.Array:
    """Per-edge-relation bilinear aggregation
    (reference ``model/gcn.py:296-386``).

    ``e_rev=None`` ⇒ directed (skip reverse band); ``e_self=None`` ⇒ no
    self loop.  ``adj_forward``/``adj_reverse`` are passed separately because
    edge dropout samples independent masks per band
    (``model/gcn.py:313,347``).
    """
    out = jnp.matmul(adj_forward, bilinear_traverse(h, e_fwd, w, b))
    if e_rev is not None:
        rev_band = (
            adj_reverse
            if adj_reverse is not None
            else jnp.swapaxes(adj_forward, 1, 2)
        )
        out = out + jnp.matmul(rev_band, bilinear_traverse(h, e_rev, w, b))
    if e_self is not None:
        out = out + self_loop_traverse(h, e_self, w, b)
    return out
