"""Pallas TPU kernel: persistent masked LSTM scan.

The BiLSTM is the flagship's serial bottleneck (~half the train step —
``tools/step_breakdown.py``): ``lax.scan`` emits T≈96 tiny HLO loop
iterations whose per-step overhead (loop bookkeeping, HBM round-trips for
h/c) dwarfs the 16-MFLOP recurrent matmul.  This kernel runs the WHOLE
time loop as a sequential Pallas grid:

* ``h``/``c`` live in VMEM scratch across grid steps — never touch HBM;
* the recurrent weights ``w_hh`` are resident in VMEM for the whole scan;
* the precomputed input projections ``xp[t] = x[t] @ W_ih + b`` stream
  through VMEM blocks (Pallas double-buffers the HBM loads);
* packed-sequence masking (freeze h/c at ``t >= length``) is a VPU select
  against the per-row length vector (reference semantics:
  ``model/gcn.py:141-146`` pack/pad round-trip);
* a leading *group* axis ``G`` runs independent LSTMs in lockstep — the
  BiLSTM stacks its two directions (the backward one on length-reversed
  input) so ONE 96-step grid advances both, one batched dot_general per
  step, instead of two sequential scans.

Backward is full BPTT as a second Pallas kernel running the grid in
reverse: carries ``dh``/``dc`` in scratch, streams the forward's saved
h/c states, RECOMPUTES the activated gates from ``xp + h_prev @ W_hh``
(one extra MXU matmul per step is far cheaper than the [T,G,B,4H]
residual write+read it replaces), accumulates ``dW_hh`` in VMEM, and
emits ``dxp`` per step.  Residual states are saved in xp's dtype, so
mixed-precision training halves the residual traffic.  The
input-projection matmuls stay in XLA on both sides of the ``custom_vjp``
boundary, so their gradients are XLA's business.

Replaces the reference's cuDNN LSTM dispatch (``model/gcn.py:186-197``)
with a TPU-native persistent kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_math(xp_block, h, whh):
    """Pre-activation → activated gates (shared by fwd and the
    recompute-in-backward path so the values are bit-identical)."""
    gates = xp_block.astype(jnp.float32) + jax.lax.dot_general(
        h, whh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [G, B, 4H]
    hd = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hd])
    f = jax.nn.sigmoid(gates[..., hd:2 * hd])
    g = jnp.tanh(gates[..., 2 * hd:3 * hd])
    o = jax.nn.sigmoid(gates[..., 3 * hd:])
    return i, f, g, o


def _fwd_kernel(*refs, has_keep: bool):
    # keep[t] is 0 where a packed segment STARTS (cross-sentence packing:
    # the carry must not leak across sentence boundaries), 1 elsewhere —
    # per direction, because the backward direction's boundaries fall at
    # length-reversed segment ENDS (ops.lstm._segment_resets).  Shipped as
    # [T, G, B, 1] so the block is already in broadcast-over-lanes layout
    # (no in-kernel relayout).  Without packing the keep operand is absent
    # and the program is identical to the original reset-free kernel.
    if has_keep:
        (len_ref, keep_ref, xp_ref, whh_ref,
         h_out_ref, c_out_ref, h_scr, c_scr) = refs
    else:
        (len_ref, xp_ref, whh_ref,
         h_out_ref, c_out_ref, h_scr, c_scr) = refs
        keep_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]                                        # [G, B, H]
    c = c_scr[:]
    if keep_ref is not None:
        keep = keep_ref[0]                              # [G, B, 1]
        h = h * keep
        c = c * keep
    i, f, g, o = _gate_math(xp_ref[0], h, whh_ref[:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    valid = (len_ref[:] > t)[None]                      # [1, B, 1] bool
    h2 = jnp.where(valid, h_new, h)
    c2 = jnp.where(valid, c_new, c)
    h_scr[:] = h2
    c_scr[:] = c2
    h_out_ref[0] = h2.astype(h_out_ref.dtype)
    c_out_ref[0] = c2.astype(c_out_ref.dtype)


def _run_forward(xp, lengths, w_hh, keep, *, interpret: bool):
    """The forward saves only h/c states (in xp's dtype — bf16 halves the
    residual traffic in mixed precision); activated gates are RECOMPUTED
    in the backward kernel from xp + h_prev, saving a [T,G,B,4H] HBM
    write+read round-trip per step."""
    t_dim, g_dim, b, h4 = xp.shape
    hd = h4 // 4
    len2 = lengths.astype(jnp.int32).reshape(b, 1)
    vec_t = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g_dim, b, d), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    has_keep = keep is not None
    in_specs = [
        pl.BlockSpec((b, 1), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [len2]
    if has_keep:
        in_specs.append(
            pl.BlockSpec((1, g_dim, b, 1), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(keep)
    in_specs += [
        vec_t(h4),
        pl.BlockSpec((g_dim, hd, h4), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [xp, w_hh]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, has_keep=has_keep),
        out_shape=(
            jax.ShapeDtypeStruct((t_dim, g_dim, b, hd), xp.dtype),
            jax.ShapeDtypeStruct((t_dim, g_dim, b, hd), xp.dtype),
        ),
        grid=(t_dim,),
        in_specs=in_specs,
        out_specs=(vec_t(hd), vec_t(hd)),
        scratch_shapes=[
            pltpu.VMEM((g_dim, b, hd), jnp.float32),
            pltpu.VMEM((g_dim, b, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_dim * g_dim * b * hd * h4,
            bytes_accessed=4 * (xp.size + 2 * t_dim * g_dim * b * hd
                                + w_hh.size),
            transcendentals=4 * t_dim * g_dim * b * hd,
        ),
        interpret=interpret,
    )(*operands)


def _bwd_kernel(*refs, has_keep: bool):
    if has_keep:
        (len_ref, keep_ref, gy_ref, xp_ref, c_ref, cprev_ref,
         hprev_ref, whh_ref, dxp_ref, dwhh_ref, dh_scr, dc_scr,
         dwhh_scr) = refs
    else:
        (len_ref, gy_ref, xp_ref, c_ref, cprev_ref,
         hprev_ref, whh_ref, dxp_ref, dwhh_ref, dh_scr, dc_scr,
         dwhh_scr) = refs
        keep_ref = None
    i_step = pl.program_id(0)
    t_dim = pl.num_programs(0)
    t = t_dim - 1 - i_step                               # actual time index

    @pl.when(i_step == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwhh_scr[:] = jnp.zeros_like(dwhh_scr)

    hd = dh_scr.shape[-1]
    valid = (len_ref[:] > t)[None]                       # [1, B, 1]
    c_new = c_ref[0].astype(jnp.float32)
    # the forward consumed keep[t]·state[t-1] (segment resets) — mirror it
    c_prev = jnp.where(t > 0, cprev_ref[0].astype(jnp.float32), 0.0)
    h_prev = jnp.where(t > 0, hprev_ref[0].astype(jnp.float32), 0.0)
    if keep_ref is not None:
        keep = keep_ref[0]                               # [G, B, 1]
        c_prev = c_prev * keep
        h_prev = h_prev * keep
    # recompute the activated gates from xp + h_prev (one extra MXU matmul)
    # instead of streaming a [T,G,B,4H] residual saved by the forward
    i, f, g, o = _gate_math(xp_ref[0], h_prev, whh_ref[:])

    # y[t] = valid ? h_state[t] : 0, and the h/c carries freeze when
    # invalid — so on invalid rows the incoming dh/dc pass straight
    # through to t-1 and the gate grads are zero.
    dh_tot = dh_scr[:] + gy_ref[0].astype(jnp.float32)
    dc_tot = dc_scr[:]
    tc = jnp.tanh(c_new)
    do = dh_tot * tc
    dc_all = dc_tot + dh_tot * o * (1.0 - tc * tc)
    di = dc_all * g
    df = dc_all * c_prev
    dg = dc_all * i
    dgates = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1,
    )                                                    # [G, B, 4H]
    dgates = jnp.where(valid, dgates, 0.0)

    # the carry into step t was keep[t]·state[t-1]: the cotangent flowing
    # to t-1 carries the same factor (0 across segment boundaries)
    dh_prev = jax.lax.dot_general(
        dgates, whh_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # [G, B, H]
    dc_prev = dc_all * f
    if keep_ref is not None:
        dh_prev = dh_prev * keep
        dc_prev = dc_prev * keep
    dh_scr[:] = jnp.where(valid, dh_prev, dh_tot)
    dc_scr[:] = jnp.where(valid, dc_prev, dc_tot)
    dwhh_scr[:] += jax.lax.dot_general(
        h_prev, dgates, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # [G, H, 4H]
    dxp_ref[0] = dgates.astype(dxp_ref.dtype)

    @pl.when(i_step == t_dim - 1)
    def _():
        dwhh_ref[:] = dwhh_scr[:].astype(dwhh_ref.dtype)


def _run_backward(gy, lengths, w_hh, xp, h_states, c_states, keep, *,
                  interpret: bool):
    t_dim, g_dim, b, hd = gy.shape
    h4 = 4 * hd
    len2 = lengths.astype(jnp.int32).reshape(b, 1)
    rev = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g_dim, b, d), lambda s: (t_dim - 1 - s, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rev_prev = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g_dim, b, d),
        lambda s: (jnp.maximum(t_dim - 2 - s, 0), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = lambda: pl.BlockSpec(  # noqa: E731
        (g_dim, hd, h4), lambda s: (0, 0, 0), memory_space=pltpu.VMEM)
    has_keep = keep is not None
    in_specs = [
        pl.BlockSpec((b, 1), lambda s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [len2]
    if has_keep:
        in_specs.append(
            pl.BlockSpec((1, g_dim, b, 1),
                         lambda s: (t_dim - 1 - s, 0, 0, 0),
                         memory_space=pltpu.VMEM))   # keep (time t)
        operands.append(keep)
    in_specs += [
        rev(hd),            # gy
        rev(h4),            # xp (gate recompute)
        rev(hd),            # c_states (t)
        rev_prev(hd),       # c_states (t-1)
        rev_prev(hd),       # h_states (t-1)
        wspec(),
    ]
    operands += [gy, xp, c_states, c_states, h_states, w_hh]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, has_keep=has_keep),
        out_shape=(
            jax.ShapeDtypeStruct((t_dim, g_dim, b, h4), jnp.float32),
            jax.ShapeDtypeStruct((g_dim, hd, h4), jnp.float32),
        ),
        grid=(t_dim,),
        in_specs=in_specs,
        out_specs=(rev(h4), wspec()),
        scratch_shapes=[
            pltpu.VMEM((g_dim, b, hd), jnp.float32),
            pltpu.VMEM((g_dim, b, hd), jnp.float32),
            pltpu.VMEM((g_dim, hd, h4), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * t_dim * g_dim * b * hd * h4,
            bytes_accessed=4 * (3 * gy.size + xp.size + 2 * w_hh.size),
            transcendentals=5 * t_dim * g_dim * b * hd,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lstm_scan_core(xp, lengths, w_hh, keep, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h_states, _ = _run_forward(xp, lengths, w_hh, keep,
                               interpret=interpret)
    return h_states


def _fwd(xp, lengths, w_hh, keep, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h_states, c_states = _run_forward(
        xp, lengths, w_hh, keep, interpret=interpret
    )
    return h_states, (lengths, w_hh, xp, h_states, c_states, keep)


def _bwd(interpret, res, gy):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lengths, w_hh, xp, h_states, c_states, keep = res
    # freeze-carry rows replicate h[t-1]: their cotangent arrives via the
    # carry chain inside the kernel, so out-of-range gy must be zero —
    # enforce it (cheap) instead of assuming the caller masked.
    t_dim = gy.shape[0]
    tpos = jnp.arange(t_dim, dtype=jnp.int32)[:, None, None, None]
    gy = jnp.where(
        tpos < lengths.astype(jnp.int32)[None, None, :, None],
        gy.astype(jnp.float32), 0.0,
    )
    dxp, dwhh = _run_backward(
        gy, lengths, w_hh, xp, h_states, c_states, keep,
        interpret=interpret,
    )
    return dxp.astype(xp.dtype), None, dwhh.astype(w_hh.dtype), None


_lstm_scan_core.defvjp(_fwd, _bwd)


def lstm_scan_stacked(xp, lengths, w_hh, interpret=None, keep=None):
    """G independent masked LSTMs advanced in lockstep.

    xp: [T, G, B, 4H] time-major input projections (``x @ W_ih + b_ih +
    b_hh``), lengths [B] (shared across groups), w_hh [G, H, 4H] (torch
    i,f,g,o gate order) → h_states [T, G, B, H] where rows freeze at
    ``t >= length`` (caller masks to zeros for the packed-output
    convention).  The BiLSTM uses G=2: forward direction + backward
    direction on the length-reversed input.

    ``keep`` ([T, G, B] float, 0 where a packed segment starts per
    direction, 1 elsewhere) zeroes the h/c carry at cross-sentence
    boundaries — exact per-sentence semantics on packed rows
    (``ops.lstm._segment_resets``); None = no resets (all-ones).
    """
    t_dim, g_dim, b, _ = xp.shape
    if keep is not None:
        keep = keep.astype(jnp.float32).reshape(t_dim, g_dim, b, 1)
    return _lstm_scan_core(xp, lengths, w_hh, keep, interpret)


def lstm_scan(xp, lengths, w_hh, interpret=None):
    """Single-LSTM convenience wrapper: xp [T, B, 4H], w_hh [H, 4H] →
    h_states [T, B, H] (see ``lstm_scan_stacked``)."""
    out = lstm_scan_stacked(xp[:, None], lengths, w_hh[None], interpret)
    return out[:, 0]
