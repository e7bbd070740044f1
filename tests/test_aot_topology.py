"""AOT compilation of the sharded train step against a REAL TPU topology
(v5e-8) — no hardware needed (``jax.experimental.topologies``).

This is the only place the XLA:TPU pipeline (GSPMD partitioning, Mosaic
lowering, collective scheduling) runs over the multi-chip path: the CPU
virtual mesh used everywhere else skips Pallas kernels entirely and
lowers collectives through a different backend.  It pins:

* the step COMPILES for real multi-chip TPU at all — this audit caught
  the unwrapped persistent-LSTM "Mosaic kernels cannot be automatically
  partitioned" failure (fixed via ``ops/lstm._bidirectional_pallas_spmd``),
* ONE merged fwd+rev halo exchange per layer per pass (2 layers →
  2 forward + 2 backward all-to-alls, by op_name),
* the exchange lowers ASYNC (start/done pair) under the
  ``xla_tpu_enable_async_all_to_all`` option that
  ``parallel.train_step.make_sharded_train_step`` sets for halo mode.

See tools/aot_topology.py and docs/design.md §6b for the full audit
(memory per device, overlap-window schedule excerpt, 2-slice DCN
compile).
"""

import pytest

topologies = pytest.importorskip("jax.experimental.topologies")


@pytest.fixture(scope="module")
def v5e8_mesh():
    from tools.aot_topology import make_topology_mesh

    try:
        return make_topology_mesh("v5e:2x4")
    except Exception as e:  # no TPU compiler support in this env
        pytest.skip(f"TPU topology description unavailable: {e}")


def test_halo_step_aot_compiles_with_async_merged_exchange(v5e8_mesh):
    from tools.aot_topology import audit_hlo, build_step, overlap_window

    fused_step, args, (b, n, cfg) = build_step("halo", v5e8_mesh)
    compiled = fused_step.lower(*args).compile(
        compiler_options={"xla_tpu_enable_async_all_to_all": "true"})
    ma = compiled.memory_analysis()
    assert ma.argument_size_in_bytes > 0
    txt = compiled.as_text()
    audit = audit_hlo(txt, b * n * cfg.model.hidden_dim)
    # ONE merged exchange per layer per pass: 2 layers -> 2 fwd + 2 bwd.
    # A regression to per-band exchanges would double this to 8.
    assert audit["halo_exchange_a2a"] == 2 * cfg.model.num_layers, audit
    # async lowering: every halo exchange is a start/done pair
    assert audit["halo_exchange_async"] == 2 * cfg.model.num_layers, audit
    # and the scheduler can place work inside the first window
    ow = overlap_window(txt)
    assert ow is not None
    # sequence-parallel grouped transform: under halo the per-token
    # full_deprel transform runs node-sharded (2-D shard_map in
    # ops.gcn_layers), so NO all-gather may appear inside
    # _full_deprel_components — a regression re-gathers [B, N, *]
    # activations (or the composed [R, T, H] matrices) per band per
    # layer (design.md §6b item 4, closed in round 5)
    import re

    fd_gathers = [
        ln for ln in txt.splitlines()
        if re.search(r"\ball-gather(-start)?\(", ln)
        and "_full_deprel_components" in ln
    ]
    assert not fd_gathers, fd_gathers[:3]


def test_edges_and_attention_steps_aot_compile(v5e8_mesh):
    from tools.aot_topology import build_step

    for mode in ("edges", "attn_edges"):
        fused_step, args, _ = build_step(mode, v5e8_mesh)
        compiled = fused_step.lower(*args).compile()
        assert compiled.memory_analysis().argument_size_in_bytes > 0
