"""Pallas TPU kernel: grouped (ragged) matmul over relation-sorted tokens.

    y[m] = x[m] @ s[gid(m)]        (rows sorted so each group is contiguous)

This is the compute core of the *factored* full_deprel path
(``ops.gcn_layers.grouped_bilinear``): the reference's per-token bilinear
transform (``model/gcn.py:400-415``) reduces to one matmul per token against
its relation's composed matrix ``S[r] = Σ_d table[r,d]·W[d]``.  XLA's
``lax.ragged_dot`` lowering handles this correctly but pays a ~5× overhead
at our sizes (it loops the R groups with dynamic slices); this kernel is
MoE-style instead:

* the m axis is cut into TM-row tiles; a *visit* is the intersection of a
  tile with a group (tiles and groups are both contiguous in the sorted
  order, so visits are the segments of the merged boundary list);
* the grid runs one step per visit; scalar-prefetched metadata steers the
  BlockSpec index maps — the x/y tile and the [T,H] group matrix for that
  visit;
* consecutive visits of one tile revisit the same output block (it stays
  resident in VMEM), each masking its own row range, so a tile spanning
  three groups costs three MXU matmuls but only one y write;
* the backward kernels reuse the same visit schedule: dx mirrors the
  forward with S transposed in-register (``dot_general`` on the H axis),
  and dS accumulates ``x_visitᵀ @ g_visit`` into the group's [T,H] block —
  visits of one group are consecutive, so the accumulator also stays in
  VMEM.

Metadata is O(V = n_tiles + R) int32 scalars computed with jnp on device —
no host round-trip, and the schedule is recomputed per batch so any group
distribution works with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128


def _schedule(group_sizes: jax.Array, m_pad: int, n_tiles: int):
    """Visit schedule: merged tile/group boundaries in sorted-row space.

    Returns int32 arrays of static length V = n_tiles + R (+1 for bounds):
    bounds[v]..bounds[v+1] is visit v's row range; tile_ids/gids index the
    x/y tile and the group matrix; init_tile/init_group flag the first
    visit of each output block (zero-init points).  Empty visits (equal
    bounds) mask to nothing and reuse the previous indices' blocks.
    """
    r = group_sizes.shape[0]
    gs = group_sizes.astype(jnp.int32)
    gstart = jnp.cumsum(gs) - gs                       # [R]
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE_M
    bounds = jnp.sort(jnp.concatenate([tile_starts, gstart]))  # [V]
    bounds_ext = jnp.concatenate(
        [bounds, jnp.array([m_pad], jnp.int32)]
    )                                                   # [V+1]
    tile_ids = jnp.clip(bounds // TILE_M, 0, n_tiles - 1)
    gids = jnp.clip(
        jnp.searchsorted(gstart, bounds, side="right").astype(jnp.int32) - 1,
        0, r - 1,
    )
    prev_tile = jnp.concatenate([jnp.array([-1], jnp.int32), tile_ids[:-1]])
    prev_gid = jnp.concatenate([jnp.array([-1], jnp.int32), gids[:-1]])
    init_tile = (tile_ids != prev_tile).astype(jnp.int32)
    init_group = (gids != prev_gid).astype(jnp.int32)
    return bounds_ext, tile_ids, gids, init_tile, init_group


def _row_mask(bounds_ref, tile_ids_ref, v, tm):
    start = bounds_ref[v]
    end = bounds_ref[v + 1]
    rows = tile_ids_ref[v] * TILE_M + jax.lax.broadcasted_iota(
        jnp.int32, (tm, 1), 0
    )
    return (rows >= start) & (rows < end)


def _fwd_kernel(bounds_ref, tile_ids_ref, gids_ref, init_ref, _ig_ref,
                x_ref, s_ref, y_ref):
    v = pl.program_id(0)

    @pl.when(init_ref[v] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    mask = _row_mask(bounds_ref, tile_ids_ref, v, x_ref.shape[0])
    x = jnp.where(mask, x_ref[:], jnp.zeros((), x_ref.dtype))
    # visits partition rows, so += touches disjoint rows across revisits
    y_ref[:] += jnp.dot(
        x, s_ref[0], preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)


def _bwd_kernel(bounds_ref, tile_ids_ref, gids_ref, init_t_ref, init_g_ref,
                x_ref, g_ref, s_ref, dx_ref, ds_ref):
    """Fused backward: dx and dS in one pass so each visit's S block (the
    dominant HBM traffic — R·T·H ≫ M·T here) is read once, not twice."""
    v = pl.program_id(0)

    @pl.when(init_t_ref[v] == 1)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(init_g_ref[v] == 1)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)

    mask = _row_mask(bounds_ref, tile_ids_ref, v, g_ref.shape[0])
    g = jnp.where(mask, g_ref[:], jnp.zeros((), g_ref.dtype))
    # g @ S[gid]^T without materializing the transpose
    dx_ref[:] += jax.lax.dot_general(
        g, s_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    # x_visit^T @ g_visit — real accumulation across a group's visits, so
    # ds blocks are fp32 (cast by the caller)
    x = jnp.where(mask, x_ref[:], jnp.zeros((), x_ref.dtype))
    ds_ref[0] += jax.lax.dot_general(
        x, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_rows(a, m_pad):
    return jnp.pad(a, ((0, m_pad - a.shape[0]), (0, 0)))


def _gmm_forward(x, s, group_sizes, *, interpret: bool):
    m, t = x.shape
    r, _, h = s.shape
    n_tiles = pl.cdiv(m, TILE_M)
    m_pad = n_tiles * TILE_M
    meta = _schedule(group_sizes, m_pad, n_tiles)
    v = meta[1].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(v,),
        in_specs=[
            pl.BlockSpec((TILE_M, t), lambda v, b, ti, gi, it, ig: (ti[v], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h), lambda v, b, ti, gi, it, ig: (gi[v], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, h),
                               lambda v, b, ti, gi, it, ig: (ti[v], 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, h), x.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * t * h,
            bytes_accessed=m_pad * (t + h) * 4 + v * t * h * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*meta, _pad_rows(x, m_pad), s)
    return y[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gmm(x, s, group_sizes, interpret):
    return _gmm_forward(x, s, group_sizes, interpret=interpret)


def _gmm_fwd(x, s, group_sizes, interpret):
    return _gmm_forward(x, s, group_sizes, interpret=interpret), (
        x, s, group_sizes,
    )


def _gmm_bwd(interpret, res, g):
    x, s, group_sizes = res
    m, t = x.shape
    r, _, h = s.shape
    n_tiles = pl.cdiv(m, TILE_M)
    m_pad = n_tiles * TILE_M
    meta = _schedule(group_sizes, m_pad, n_tiles)
    v = meta[1].shape[0]
    g_pad = _pad_rows(g.astype(x.dtype), m_pad)

    bwd_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(v,),
        in_specs=[
            pl.BlockSpec((TILE_M, t), lambda v, b, ti, gi, it, ig: (ti[v], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, h), lambda v, b, ti, gi, it, ig: (ti[v], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h), lambda v, b, ti, gi, it, ig: (gi[v], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, t),
                         lambda v, b, ti, gi, it, ig: (ti[v], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h),
                         lambda v, b, ti, gi, it, ig: (gi[v], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dx, ds = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, t), x.dtype),
            jax.ShapeDtypeStruct((r, t, h), jnp.float32),
        ),
        grid_spec=bwd_spec,
        interpret=interpret,
    )(*meta, _pad_rows(x, m_pad), g_pad, s)
    dx = dx[:m]
    # groups with no rows were never visited: their blocks are undefined
    ds = jnp.where(
        (group_sizes > 0)[:, None, None], ds, jnp.zeros((), ds.dtype)
    ).astype(s.dtype)
    return dx, ds, None


_gmm.defvjp(_gmm_fwd, _gmm_bwd)


def grouped_matmul(x, s, group_sizes, interpret=None):
    """``y[m] = x[m] @ s[gid(m)]`` for rows sorted by group.

    x: [M, T] (group-contiguous rows), s: [R, T, H],
    group_sizes: [R] int32 summing to ≤ M → [M, H].

    Drop-in replacement for ``lax.ragged_dot`` with a custom VJP; rows
    beyond ``sum(group_sizes)`` are treated as belonging to the last group
    (zero-pad x there, as the sort-by-id layout guarantees).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gmm(x, s, group_sizes.astype(jnp.int32), interpret)
