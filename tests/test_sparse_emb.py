"""Row-sparse embedding updates (gcn_tpu.train.sparse_emb): numerical
equivalence with the dense optimizer path, coalescing semantics, and
checkpoint interchangeability across modes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as g
from gcn_tpu.train.trainer import Trainer


def _cfg(optim="sgd", mode="auto", topn=10**10, emb_dropout=0.0):
    cfg = g._flagship_cfg(tiny=True)
    cfg.model.rnn = False
    cfg.train.optim = optim
    cfg.train.lr = 0.3
    cfg.train.effective_batch_size = 8
    cfg.train.sparse_emb_grad = mode
    cfg.model.topn = topn
    cfg.model.emb_dropout = emb_dropout
    return cfg


def _train(cfg, steps=4, chunk=False):
    batch = g._synthetic_batch(cfg, b=8, n=16)
    tr = Trainer(cfg, rng_seed=0, init_batch=batch)
    batches = [g._synthetic_batch(cfg, b=8, n=16, seed=i)
               for i in range(steps)]
    if chunk:
        losses = [float(x) for x in tr.update_chunk(batches)]
    else:
        losses = [float(tr.update(b)) for b in batches]
    return losses, tr


def _max_delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_coalesce_matches_dense_scatter_add():
    from gcn_tpu.train.sparse_emb import coalesce

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 7, 40).astype(np.int32)
    rows = rng.randn(40, 5).astype(np.float32)
    sids, crows = coalesce(jnp.asarray(ids), jnp.asarray(rows))
    dense = np.zeros((7, 5), np.float32)
    np.add.at(dense, ids, rows)
    recon = np.zeros((7, 5), np.float32)
    np.add.at(recon, np.asarray(sids), np.asarray(crows))
    np.testing.assert_allclose(recon, dense, atol=1e-5)
    # duplicates carry zeros: one scatter position per unique id
    nz = np.asarray(crows).any(axis=1).sum()
    assert nz == len(np.unique(ids))


@pytest.mark.parametrize("optim", ["sgd", "adagrad"])
@pytest.mark.parametrize("topn,emb_dropout", [
    (10**10, 0.0),   # finetune all
    (40, 0.3),       # partial freeze + type-level embedding dropout
    (0, 0.0),        # fully frozen table
])
def test_sparse_matches_dense(optim, topn, emb_dropout):
    ls, trs = _train(_cfg(optim, "true", topn, emb_dropout))
    ld, trd = _train(_cfg(optim, "false", topn, emb_dropout))
    assert trs._sparse_emb and not trd._sparse_emb
    np.testing.assert_allclose(ls, ld, rtol=1e-6, atol=1e-6)
    assert _max_delta(trs.params, trd.params) < 1e-6
    assert _max_delta(trs.opt_state, trd.opt_state) < 1e-6


def test_sparse_chunked_dispatch_matches_dense():
    cfg_s = _cfg("adagrad", "true")
    cfg_s.train.steps_per_dispatch = 4
    ls, trs = _train(cfg_s, chunk=True)
    ld, trd = _train(_cfg("adagrad", "false"))
    np.testing.assert_allclose(ls, ld, rtol=1e-6, atol=1e-6)
    assert _max_delta(trs.params, trd.params) < 1e-6


def test_auto_eligibility():
    from gcn_tpu.train.trainer import SPARSE_EMB_AUTO_VOCAB

    # auto switches on the measured vocab crossover (scatter cost is
    # ~constant per row; the dense update scales with the table)
    big = _cfg("sgd", "auto")
    big.model.vocab_size = SPARSE_EMB_AUTO_VOCAB
    assert Trainer(big)._sparse_emb
    assert not Trainer(_cfg("sgd", "auto"))._sparse_emb  # tiny vocab
    # adam-family stays dense (per-row state decays untouched rows)
    big_adam = _cfg("adam", "auto")
    big_adam.model.vocab_size = SPARSE_EMB_AUTO_VOCAB
    assert not Trainer(big_adam)._sparse_emb
    # accumulating configs stay dense
    cfg = _cfg("sgd", "auto")
    cfg.model.vocab_size = SPARSE_EMB_AUTO_VOCAB
    cfg.train.effective_batch_size = 16
    assert not Trainer(cfg)._sparse_emb
    # forcing it on an unsupported config is an explicit error
    cfg = _cfg("adam", "true")
    with pytest.raises(ValueError):
        Trainer(cfg)


def test_checkpoints_interchangeable_across_modes(tmp_path):
    """The optimizer-state pytree is structurally identical in both
    modes: a dense-mode checkpoint resumes a sparse-mode trainer and
    vice versa, continuing the identical trajectory."""
    ls, trs = _train(_cfg("adagrad", "true"), steps=2)
    trs.save(str(tmp_path / "ck"), epoch=1)

    cfg_d = _cfg("adagrad", "false")
    batch = g._synthetic_batch(cfg_d, b=8, n=16)
    trd = Trainer(cfg_d, rng_seed=0, init_batch=batch)
    trd.load(str(tmp_path / "ck"))
    assert _max_delta(trs.params, trd.params) < 1e-7

    # continue one step in each mode from the restored state: identical
    nxt = g._synthetic_batch(cfg_d, b=8, n=16, seed=9)
    l_dense = float(trd.update(nxt))

    tr2 = Trainer(_cfg("adagrad", "true"), rng_seed=0,
                  init_batch=batch)
    tr2.load(str(tmp_path / "ck"))
    l_sparse = float(tr2.update(nxt))
    assert abs(l_dense - l_sparse) < 1e-6
    assert _max_delta(tr2.params, trd.params) < 1e-6


def test_mesh_forced_sparse_matches_single_device():
    """--sparse_emb_grad true under the 8-device mesh: the row scatter
    onto the vocab-sharded table must produce the single-device result
    (auto turns it off on a mesh; true forces it)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from gcn_tpu.train.distributed_trainer import DistributedTrainer

    cfg = _cfg("adagrad", "true")
    batch = g._synthetic_batch(cfg, b=8, n=16)
    dt = DistributedTrainer(cfg, rng_seed=0, init_batch=batch)
    assert dt._sparse_emb
    # auto is off on a mesh
    assert not DistributedTrainer(
        _cfg("adagrad", "auto"), rng_seed=0, init_batch=batch
    )._sparse_emb
    st = Trainer(_cfg("adagrad", "false"), rng_seed=0, init_batch=batch)
    for i in range(3):
        b = g._synthetic_batch(cfg, b=8, n=16, seed=i)
        ld = float(dt.update(b))
        ls = float(st.update(b))
        assert abs(ld - ls) < 1e-5
    assert _max_delta(dt.params, st.params) < 1e-5
