"""Masked-scan BiLSTM vs torch packed-sequence golden (unsorted lengths,
2 stacked layers)."""

import numpy as np

from gcn_tpu.ops.lstm import bilstm
from tests.conftest import load_golden


def test_bilstm_matches_packed_torch():
    z = load_golden("lstm.npz")
    b, t, d, h, layers = z["dims"]
    params = []
    in_dim = d
    for li in range(layers):
        layer = {}
        for dr, suffix in (("fwd", ""), ("bwd", "_reverse")):
            layer[dr] = dict(
                w_ih=z[f"state.weight_ih_l{li}{suffix}"].T,
                w_hh=z[f"state.weight_hh_l{li}{suffix}"].T,
                b_ih=z[f"state.bias_ih_l{li}{suffix}"],
                b_hh=z[f"state.bias_hh_l{li}{suffix}"],
            )
        params.append(layer)
        in_dim = 2 * h
    out = bilstm(params, z["x"], z["lengths"])
    np.testing.assert_allclose(np.asarray(out), z["out"], atol=2e-5, rtol=1e-4)


def test_bilstm_unroll_invariant():
    """``unroll`` is a scheduling knob: unrolled scans must agree with the
    rolled scan to fusion-reassociation noise (~1e-6) and still match the
    torch golden at the golden tolerance."""
    z = load_golden("lstm.npz")
    b, t, d, h, layers = z["dims"]
    params = []
    for li in range(layers):
        layer = {}
        for dr, suffix in (("fwd", ""), ("bwd", "_reverse")):
            layer[dr] = dict(
                w_ih=z[f"state.weight_ih_l{li}{suffix}"].T,
                w_hh=z[f"state.weight_hh_l{li}{suffix}"].T,
                b_ih=z[f"state.bias_ih_l{li}{suffix}"],
                b_hh=z[f"state.bias_hh_l{li}{suffix}"],
            )
        params.append(layer)
    base = np.asarray(bilstm(params, z["x"], z["lengths"]))
    for unroll in (2, 4):
        out = np.asarray(bilstm(params, z["x"], z["lengths"], unroll=unroll))
        np.testing.assert_allclose(out, base, atol=1e-6)
    np.testing.assert_allclose(base, z["out"], atol=2e-5, rtol=1e-4)


def test_bilstm_zero_padding():
    z = load_golden("lstm.npz")
    b, t, d, h, layers = z["dims"]
    params = []
    for li in range(layers):
        layer = {}
        for dr, suffix in (("fwd", ""), ("bwd", "_reverse")):
            layer[dr] = dict(
                w_ih=z[f"state.weight_ih_l{li}{suffix}"].T,
                w_hh=z[f"state.weight_hh_l{li}{suffix}"].T,
                b_ih=z[f"state.bias_ih_l{li}{suffix}"],
                b_hh=z[f"state.bias_hh_l{li}{suffix}"],
            )
        params.append(layer)
    out = np.asarray(bilstm(params, z["x"], z["lengths"]))
    for i, L in enumerate(z["lengths"]):
        assert np.all(out[i, L:] == 0.0)
