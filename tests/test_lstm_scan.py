"""Persistent Pallas LSTM scan (ops.pallas.lstm_scan) vs the lax.scan
reference: forward parity, grad parity (full BPTT incl. masking), and the
bilstm impl="pallas" path against the torch golden."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.ops.lstm import _bidirectional_fused, _bidirectional_pallas
from gcn_tpu.ops.pallas.lstm_scan import lstm_scan
from tests.conftest import load_golden


def _rand_layer(key, d, h):
    ks = jax.random.split(key, 8)
    mk = lambda k, shp: jax.random.normal(k, shp, jnp.float32) * 0.2
    return {
        dr: {
            "w_ih": mk(ks[i * 4 + 0], (d, 4 * h)),
            "w_hh": mk(ks[i * 4 + 1], (h, 4 * h)),
            "b_ih": mk(ks[i * 4 + 2], (4 * h,)),
            "b_hh": mk(ks[i * 4 + 3], (4 * h,)),
        }
        for i, dr in enumerate(("fwd", "bwd"))
    }


def _scan_states(xp, lengths, w_hh):
    """Frozen-carry h-state reference in plain lax.scan."""
    t_dim, b, h4 = xp.shape
    hd = h4 // 4

    def step(carry, inp):
        h, c, idx = carry
        gates = inp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        valid = (idx < lengths)[:, None]
        h2 = jnp.where(valid, h_new, h)
        c2 = jnp.where(valid, c_new, c)
        return (h2, c2, idx + 1), h2

    zeros = jnp.zeros((b, hd), jnp.float32)
    _, hs = jax.lax.scan(step, (zeros, zeros, jnp.int32(0)), xp)
    return hs


def test_lstm_scan_forward_matches_scan():
    b, t, h = 8, 12, 16
    key = jax.random.key(0)
    xp = jax.random.normal(key, (t, b, 4 * h), jnp.float32)
    w_hh = jax.random.normal(jax.random.key(1), (h, 4 * h),
                             jnp.float32) * 0.2
    lengths = jnp.asarray([12, 3, 7, 1, 12, 9, 5, 10], jnp.int32)
    out = lstm_scan(xp, lengths, w_hh)
    ref = _scan_states(xp, lengths, w_hh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_lstm_scan_grads_match_scan():
    b, t, h = 4, 10, 8
    xp = jax.random.normal(jax.random.key(2), (t, b, 4 * h), jnp.float32)
    w_hh = jax.random.normal(jax.random.key(3), (h, 4 * h),
                             jnp.float32) * 0.2
    lengths = jnp.asarray([10, 4, 7, 1], jnp.int32)
    # data-dependent cotangent + padded-position masking as in the model
    valid = (jnp.arange(t)[:, None] < lengths[None, :])[:, :, None]

    def loss(fn):
        def inner(xp_, w_):
            out = jnp.where(valid, fn(xp_, lengths, w_), 0.0)
            return jnp.sum(out * out)
        return inner

    g_pallas = jax.grad(loss(lstm_scan), argnums=(0, 1))(xp, w_hh)
    g_scan = jax.grad(loss(_scan_states), argnums=(0, 1))(xp, w_hh)
    np.testing.assert_allclose(np.asarray(g_pallas[0]),
                               np.asarray(g_scan[0]), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pallas[1]),
                               np.asarray(g_scan[1]), atol=1e-5, rtol=1e-4)


def test_bidirectional_pallas_matches_fused():
    b, t, d, h = 6, 14, 12, 8
    x = jax.random.normal(jax.random.key(4), (b, t, d), jnp.float32)
    lengths = jnp.asarray([14, 2, 9, 14, 5, 11], jnp.int32)
    layer = _rand_layer(jax.random.key(5), d, h)
    out_p = _bidirectional_pallas(x, lengths, layer)
    out_s = _bidirectional_fused(x, lengths, layer)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               atol=1e-5, rtol=1e-5)


def test_bilstm_pallas_matches_torch_golden():
    from gcn_tpu.ops.lstm import bilstm

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
    out = bilstm(params, z["x"], z["lengths"], impl="pallas")
    np.testing.assert_allclose(np.asarray(out), z["out"],
                               atol=2e-5, rtol=1e-4)


def test_bilstm_pallas_spmd_wrapper_matches_scan():
    """The shard_map wrapper the sharded train step relies on
    (``_bidirectional_pallas_spmd`` via an active ``local_grouping``
    mesh): forward AND grads must match the scan engine on the virtual
    mesh.  Without the wrapper a real multi-chip TPU compile fails with
    "Mosaic kernels cannot be automatically partitioned" (caught by the
    AOT topology audit, tests/test_aot_topology.py)."""
    from gcn_tpu.ops.lstm import bilstm
    from gcn_tpu.parallel.mesh import make_mesh
    from gcn_tpu.utils.shard_ctx import local_grouping

    b, t, d, h = 8, 10, 12, 16
    key = jax.random.key(0)
    layer = _rand_layer(key, d, h)
    x = jax.random.normal(jax.random.key(1), (b, t, d), jnp.float32)
    lengths = jnp.array([10, 7, 3, 1, 9, 10, 5, 2], jnp.int32)

    def run(params, impl, mesh=None):
        def loss(p):
            y = bilstm([p], x, lengths, impl=impl)
            return jnp.sum(y * y), y

        if mesh is None:
            return jax.value_and_grad(loss, has_aux=True)(params)
        with local_grouping(mesh):
            return jax.jit(jax.value_and_grad(loss, has_aux=True))(params)

    (l_ref, y_ref), g_ref = run(layer, "scan")
    mesh = make_mesh(data=4, model=2)
    (l_sp, y_sp), g_sp = run(layer, "pallas", mesh=mesh)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               atol=2e-5)
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=2e-4),
        g_sp, g_ref)


def test_bilstm_pallas_spmd_ragged_batch_falls_back():
    """B not divisible by the data axis: the wrapper must fall back to
    the scan engine instead of producing a shard_map shape error."""
    from gcn_tpu.ops.lstm import bilstm
    from gcn_tpu.parallel.mesh import make_mesh
    from gcn_tpu.utils.shard_ctx import local_grouping

    b, t, d, h = 6, 5, 8, 8
    layer = _rand_layer(jax.random.key(2), d, h)
    x = jax.random.normal(jax.random.key(3), (b, t, d), jnp.float32)
    lengths = jnp.array([5, 4, 3, 2, 1, 5], jnp.int32)
    y_ref = bilstm([layer], x, lengths, impl="scan")
    with local_grouping(make_mesh(data=4, model=2)):
        y = bilstm([layer], x, lengths, impl="pallas")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
