"""Coverage for remaining components: variational dropout, prepare_vocab
end-to-end with a fake GloVe file, distributed runtime info, config IO
round-trip."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.config import Config, cgcn_preset
from gcn_tpu.ops.dropout import variational_dropout


def test_variational_dropout_shares_mask_over_sequence():
    key = jax.random.key(0)
    x = jnp.ones((4, 10, 32))
    y = np.asarray(variational_dropout(key, x, 0.5, False))
    # mask constant along the token axis (reference model/dropouts.py:16)
    assert (y == y[:, :1, :]).all()
    assert ((y == 0) | np.isclose(y, 2.0)).all()


def test_prepare_vocab_end_to_end(tmp_path):
    """Run the prepare_vocab CLI against a fake GloVe file and the synthetic
    sample data; check reference-compatible artifacts."""
    glove_dir = tmp_path / "glove"
    glove_dir.mkdir()
    words = ["the", "fox", "dog", "company", "new", "york"]
    with open(glove_dir / "mini.txt", "w") as f:
        for i, w in enumerate(words):
            vec = " ".join(str(0.1 * i) for _ in range(5))
            f.write(f"{w} {vec}\n")
    out = subprocess.run(
        [sys.executable, "prepare_vocab.py", "dataset/tacred",
         str(tmp_path / "vocab_out"), "--glove_dir", str(glove_dir),
         "--wv_file", "mini.txt", "--wv_dim", "5"],
        capture_output=True, text=True, cwd=".",
    )
    assert out.returncode == 0, out.stderr
    import pickle

    with open(tmp_path / "vocab_out" / "vocab.pkl", "rb") as f:
        vocab = pickle.load(f)
    emb = np.load(tmp_path / "vocab_out" / "embedding.npy")
    assert vocab[0] == "<PAD>" and vocab[1] == "<UNK>"
    assert "SUBJ-PERSON" in vocab and "OBJ-DATE" in vocab
    assert emb.shape == (len(vocab), 5)
    assert (emb[0] == 0).all()  # PAD row zeroed
    # every non-special vocab word came from the GloVe∩corpus intersection
    specials = 2 + len([v for v in vocab if v.startswith(("SUBJ-", "OBJ-"))])
    for w in vocab[specials:]:
        assert w in words


def test_distributed_runtime_info():
    from gcn_tpu.parallel.distributed import runtime_info

    info = runtime_info()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1


def test_config_roundtrip():
    cfg = cgcn_preset()
    cfg.model.use_pallas = True
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.model.adj_type == "full_deprel"
    assert cfg2.model.use_pallas is True
    assert cfg2.train.pooling_l2 == 0.003
    assert list(cfg2.data.length_buckets) == list(cfg.data.length_buckets)
