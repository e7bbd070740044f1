"""Pallas TPU kernel: batched SDDMM over dependency-forest edge lists.

SDDMM (sampled dense-dense matmul) computes per-edge scores

    s[b, e] = Σ_h u[b, parent_e, h] · v[b, child_e, h]       (masked)

— the sparse-attention primitive for edge-scored aggregation
(e.g. an attention-weighted GCN over the dependency bands; the reference
sketched but never wired this up — ``masked_softmax`` and the
``--deprel_attn`` flag are dead code, reference ``model/gcn.py:199-227``).

TPU-idiomatic gather: row selection is expressed as one-hot MXU
contractions (``onehot(parent)ᵀ @ U``) inside VMEM, so there is no
random-access gather at all.  Backward is a second Pallas pass with the
same structure — ``du = sel_pᵀ (ḡ ⊙ sel_c V)``, ``dv = sel_cᵀ (ḡ ⊙ sel_p U)``
with ``ḡ = g·mask`` — so scatter-adds become MXU contractions too and
nothing is gathered through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(parent_ref, child_ref, mask_ref, u_ref, v_ref, out_ref):
    n = u_ref.shape[1]
    e = parent_ref.shape[2]
    parent = parent_ref[0, 0]
    child = child_ref[0, 0]
    mask = mask_ref[0, 0]
    u = u_ref[0]
    v = v_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    sel_p = (rows == parent[:, None]).astype(u.dtype)   # [E, N]
    sel_c = (rows == child[:, None]).astype(v.dtype)
    u_sel = jnp.dot(sel_p, u, preferred_element_type=jnp.float32)  # [E, H]
    v_sel = jnp.dot(sel_c, v, preferred_element_type=jnp.float32)
    s = jnp.sum(u_sel * v_sel, axis=1)                  # [E]
    out_ref[0, 0] = (s * mask.astype(s.dtype)).astype(out_ref.dtype)


def sddmm_ref(parent, child, mask, u, v):
    """XLA formulation (oracle + backward recompute)."""
    up = jnp.take_along_axis(u, parent[:, :, None].astype(jnp.int32), axis=1)
    vc = jnp.take_along_axis(v, child[:, :, None].astype(jnp.int32), axis=1)
    s = jnp.sum(up * vc, axis=-1)
    return s * mask.astype(s.dtype)


def _forward(parent, child, mask, u, v, *, interpret: bool):
    bsz, n, h = u.shape
    e = parent.shape[1]
    parent3 = parent[:, None, :]
    child3 = child[:, None, :]
    maskf = mask.astype(jnp.float32)[:, None, :]
    vec = lambda: pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),  # noqa: E731
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, 1, e), jnp.float32),
        grid=(bsz,),
        in_specs=[
            vec(), vec(), vec(),
            pl.BlockSpec((1, n, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=vec(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (2 * e * n * h + e * h),
            bytes_accessed=4 * (u.size + v.size + bsz * e),
            transcendentals=0,
        ),
        interpret=interpret,
    )(parent3, child3, maskf, u, v)
    return out[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sddmm(parent, child, mask, u, v, interpret=None):
    """Per-edge scores u[parent]·v[child].  parent/child [B,E] int32,
    mask [B,E] bool, u/v [B,N,H] → [B,E] float32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _forward(parent, child, mask, u, v, interpret=interpret)


def _bwd_kernel(parent_ref, child_ref, mask_ref, g_ref, u_ref, v_ref,
                du_ref, dv_ref):
    n = u_ref.shape[1]
    e = parent_ref.shape[2]
    parent = parent_ref[0, 0]
    child = child_ref[0, 0]
    mask = mask_ref[0, 0]
    u = u_ref[0]
    v = v_ref[0]
    gm = (g_ref[0, 0] * mask).astype(jnp.float32)       # [E]

    rows = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    sel_p = (rows == parent[:, None]).astype(u.dtype)   # [E, N]
    sel_c = (rows == child[:, None]).astype(v.dtype)
    u_sel = jnp.dot(sel_p, u, preferred_element_type=jnp.float32)  # [E, H]
    v_sel = jnp.dot(sel_c, v, preferred_element_type=jnp.float32)
    du_ref[0] = jax.lax.dot_general(
        sel_p, (gm[:, None] * v_sel).astype(sel_p.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(du_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        sel_c, (gm[:, None] * u_sel).astype(sel_c.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


def _backward(parent, child, mask, g, u, v, *, interpret: bool):
    bsz, n, h = u.shape
    e = parent.shape[1]
    parent3 = parent[:, None, :]
    child3 = child[:, None, :]
    maskf = mask.astype(jnp.float32)[:, None, :]
    g3 = g.astype(jnp.float32)[:, None, :]
    vec = lambda: pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),  # noqa: E731
                               memory_space=pltpu.VMEM)
    feat = lambda: pl.BlockSpec((1, n, h), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(bsz,),
        in_specs=[vec(), vec(), vec(), vec(), feat(), feat()],
        out_specs=(feat(), feat()),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (4 * e * n * h + 2 * e * h),
            bytes_accessed=4 * (2 * u.size + 2 * v.size + bsz * e),
            transcendentals=0,
        ),
        interpret=interpret,
    )(parent3, child3, maskf, g3, u, v)


def _fwd(parent, child, mask, u, v, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _forward(parent, child, mask, u, v, interpret=interpret)
    return out, (parent, child, mask, u, v)


def _bwd(interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    parent, child, mask, u, v = res
    du, dv = _backward(parent, child, mask, g, u, v, interpret=interpret)
    return None, None, None, du, dv


sddmm.defvjp(_fwd, _bwd)


def edge_softmax(parent, scores, mask, n: int):
    """Normalize per-edge scores over each destination node's incoming
    edges (the attention-normalizer companion to sddmm):

        α_e = exp(s_e) / Σ_{e': parent_{e'} = parent_e} exp(s_{e'})
    """
    neg = jnp.asarray(-1e30, scores.dtype)
    masked = jnp.where(mask, scores, neg)
    b = parent.shape[0]
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], parent.shape)
    per_node_max = jnp.full((b, n), neg, scores.dtype).at[
        bidx, parent
    ].max(masked, mode="drop")
    shifted = masked - jnp.take_along_axis(
        per_node_max, parent.astype(jnp.int32), axis=1
    )
    ex = jnp.where(mask, jnp.exp(shifted), jnp.zeros((), scores.dtype))
    denom = jnp.zeros((b, n), scores.dtype).at[bidx, parent].add(
        ex, mode="drop"
    )
    denom_e = jnp.take_along_axis(denom, parent.astype(jnp.int32), axis=1)
    return ex / jnp.maximum(denom_e, 1e-30)
