"""Pallas TPU kernel: generic banded aggregation from edge lists.

Computes, per sentence, with adjacency built in VMEM from COO edge lists
(same one-hot MXU contraction as ``spmm_fused``):

    out = act( (A_f @ x_f  +  A_fᵀ @ x_r  +  x_self) / denom )
    denom = deg_out + deg_in + incident + 1        (reference semantics)

This is the shared aggregation shape of ALL the reference's deprel-aware
modes (``model/gcn.py:272-294`` diagonal, ``:296-386`` full):

* ``diagonal_deprel``:  x_f = e_fwd ⊙ h,  x_r = e_rev ⊙ h, x_self = e_s ⊙ h
* ``full_deprel``:      x_f/x_r = deprel bilinear transforms,
                        x_self = self-loop transform
* ``regular``:          x_f = x_r = h, x_self = h(W applied outside)

The [B,N,N] bands never touch HBM — in the backward pass either: the VJP of
a band aggregation is itself a band aggregation (``dx_f = A_fᵀ ĝ``,
``dx_r = A_f ĝ``, ``dx_s = ĝ`` with ``ĝ = g ⊙ act′ / denom``), so backward
is a second Pallas pass over the same edge lists (``_pair_kernel``) plus an
O(E) degree count for ``denom`` and the saved forward output for the ReLU
mask.  Nothing dense is ever materialized under ``jax.grad``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_tpu.ops.pallas.spmm_fused import onehot_adjacency


def _kernel(parent_ref, child_ref, mask_ref, xf_ref, xr_ref, xs_ref,
            out_ref, *, relu: bool):
    n = xf_ref.shape[1]
    e = parent_ref.shape[2]
    parent = parent_ref[0, 0]
    child = child_ref[0, 0]
    mask = mask_ref[0, 0]
    xf = xf_ref[0]
    xr = xr_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0)
    op = (rows == parent[None, :]).astype(xf.dtype)
    oc = (rows == child[None, :]).astype(xf.dtype)
    opm = op * mask[None, :].astype(xf.dtype)
    ocm = oc * mask[None, :].astype(xf.dtype)

    a_f = jax.lax.dot_general(
        opm, oc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_r = jax.lax.dot_general(
        ocm, op, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    deg_out = jnp.sum(a_f, axis=1, keepdims=True)
    deg_in = jnp.sum(a_r, axis=1, keepdims=True)
    incident = ((deg_out + deg_in) > 0).astype(jnp.float32)
    denom = deg_out + deg_in + incident + 1.0

    agg = jnp.dot(a_f.astype(xf.dtype), xf,
                  preferred_element_type=jnp.float32)
    agg = agg + jnp.dot(a_r.astype(xr.dtype), xr,
                        preferred_element_type=jnp.float32)
    agg = agg + xs_ref[0].astype(jnp.float32)
    z = agg / denom
    if relu:
        z = jnp.maximum(z, 0.0)
    out_ref[0] = z.astype(out_ref.dtype)


def _forward(parent, child, mask, x_f, x_r, x_s, *, relu: bool,
             interpret: bool):
    bsz, n, h = x_f.shape
    e = parent.shape[1]
    parent3 = parent[:, None, :]
    child3 = child[:, None, :]
    maskf = mask.astype(jnp.float32)[:, None, :]
    vec = lambda: pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),  # noqa: E731
                               memory_space=pltpu.VMEM)
    feat = lambda: pl.BlockSpec((1, n, h), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct((bsz, n, h), x_f.dtype),
        grid=(bsz,),
        in_specs=[vec(), vec(), vec(), feat(), feat(), feat()],
        out_specs=feat(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (2 * n * e * n + 2 * n * n * h),
            bytes_accessed=4 * (3 * x_f.size + x_f.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(parent3, child3, maskf, x_f, x_r, x_s)


def _pair_kernel(parent_ref, child_ref, mask_ref, x_ref, out_t_ref,
                 out_f_ref):
    """(A_fᵀ x, A_f x) with the bands built in VMEM — the backward-pass
    aggregation primitive."""
    n = x_ref.shape[1]
    e = parent_ref.shape[2]
    parent = parent_ref[0, 0]
    child = child_ref[0, 0]
    mask = mask_ref[0, 0]
    x = x_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0)
    op = (rows == parent[None, :]).astype(x.dtype)
    oc = (rows == child[None, :]).astype(x.dtype)
    opm = op * mask[None, :].astype(x.dtype)
    ocm = oc * mask[None, :].astype(x.dtype)

    a_f = jax.lax.dot_general(
        opm, oc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_r = jax.lax.dot_general(
        ocm, op, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_t_ref[0] = jnp.dot(
        a_r.astype(x.dtype), x, preferred_element_type=jnp.float32
    ).astype(out_t_ref.dtype)
    out_f_ref[0] = jnp.dot(
        a_f.astype(x.dtype), x, preferred_element_type=jnp.float32
    ).astype(out_f_ref.dtype)


def pair_aggregate(parent, child, mask, x, *, interpret: bool | None = None):
    """(A_fᵀ x, A_f x) from COO edge lists, adjacency VMEM-only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, n, h = x.shape
    e = parent.shape[1]
    parent3 = parent[:, None, :]
    child3 = child[:, None, :]
    maskf = mask.astype(jnp.float32)[:, None, :]
    vec = lambda: pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),  # noqa: E731
                               memory_space=pltpu.VMEM)
    feat = lambda: pl.BlockSpec((1, n, h), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pair_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, h), x.dtype),
            jax.ShapeDtypeStruct((bsz, n, h), x.dtype),
        ),
        grid=(bsz,),
        in_specs=[vec(), vec(), vec(), feat()],
        out_specs=(feat(), feat()),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (2 * n * e * n + 2 * n * n * h),
            bytes_accessed=4 * (x.size + 2 * x.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(parent3, child3, maskf, x)


def band_denom(parent, child, mask, n, dtype=jnp.float32):
    """[B,N,1] reference denominator from an O(E) degree count."""
    from gcn_tpu.ops.spmm import node_degrees

    deg_out, deg_in, incident = node_degrees(parent, child, mask, n, dtype)
    return (deg_out + deg_in + incident.astype(dtype) + 1.0)[..., None]


def band_ref_math(parent, child, mask, x_f, x_r, x_s, relu=True):
    """XLA formulation (backward recompute + correctness oracle)."""
    n = x_f.shape[1]
    a_f = onehot_adjacency(parent, child, mask, n, x_f.dtype)
    a_r = jnp.swapaxes(a_f, 1, 2)
    deg_out = jnp.sum(a_f, axis=2, keepdims=True)
    deg_in = jnp.sum(a_r, axis=2, keepdims=True)
    incident = ((deg_out + deg_in) > 0).astype(x_f.dtype)
    denom = deg_out + deg_in + incident + 1.0
    z = (jnp.matmul(a_f, x_f) + jnp.matmul(a_r, x_r) + x_s) / denom
    return jax.nn.relu(z) if relu else z


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_band_aggregate(parent, child, mask, x_f, x_r, x_s,
                         relu=True, interpret=None):
    """act((A_f x_f + A_fᵀ x_r + x_s)/denom) from COO edge lists.

    parent/child [B,E] int32, mask [B,E] bool, x_* [B,N,H] → [B,N,H].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _forward(parent, child, mask, x_f, x_r, x_s, relu=relu,
                    interpret=interpret)


def _fwd(parent, child, mask, x_f, x_r, x_s, relu, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _forward(parent, child, mask, x_f, x_r, x_s, relu=relu,
                   interpret=interpret)
    # The aggregation is linear in x_*, so the only residuals needed are the
    # edge lists, and the output itself (ReLU mask).  No [B,N,H] inputs and
    # no [B,N,N] bands are saved.
    return out, (parent, child, mask, out)


def _bwd(relu, interpret, res, g):
    parent, child, mask, out = res
    n = out.shape[1]
    denom = band_denom(parent, child, mask, n, jnp.float32)
    gz = g.astype(jnp.float32)
    if relu:
        gz = jnp.where(out > 0, gz, 0.0)
    gs = (gz / denom).astype(g.dtype)
    dxf, dxr = pair_aggregate(parent, child, mask, gs, interpret=interpret)
    return None, None, None, dxf, dxr, gs


fused_band_aggregate.defvjp(_fwd, _bwd)
