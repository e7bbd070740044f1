"""Mesh-aware Trainer: same API, SPMD execution.

Drop-in subclass of ``Trainer`` that places parameters/optimizer state
according to the mesh sharding rules (vocab-sharded embeddings,
hidden-sharded bilinear weights — ``gcn_tpu.parallel.mesh``) and ships each
batch sharded over the ``data`` axis.  The jitted step functions are
inherited unchanged: GSPMD propagates the input shardings and inserts the
ICI collectives.

This is the "trainer loop → pjit over a mesh" surface the reference never
had (single device only).  The training driver selects it automatically
when more than one device is visible.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_tpu.config import Config
from gcn_tpu.parallel.mesh import make_mesh, param_shardings, replicated
from gcn_tpu.train.trainer import Trainer


class DistributedTrainer(Trainer):
    def __init__(
        self,
        cfg: Config,
        emb_matrix: Optional[np.ndarray] = None,
        mesh: Optional[Mesh] = None,
        rng_seed: Optional[int] = None,
        init_batch: Optional[dict] = None,
    ):
        super().__init__(cfg, emb_matrix=emb_matrix, rng_seed=rng_seed,
                         init_batch=init_batch)
        model_axis = max(1, cfg.mesh.graph_axis)
        if mesh is None:
            n = len(jax.devices())
            if n % model_axis != 0:
                model_axis = 1
            mesh = make_mesh(data=n // model_axis, model=model_axis)
        self.mesh = mesh
        self.params = jax.device_put(
            self.params, param_shardings(mesh, self.params)
        )
        self.opt_state = jax.device_put(
            self.opt_state, replicated(mesh, self.opt_state)
        )

    def load(self, directory: str, load_opt_state: bool = True) -> dict:
        # restore then re-apply mesh placement (deserialized leaves are
        # plain host arrays and would otherwise land replicated)
        meta = super().load(directory, load_opt_state)
        self.params = jax.device_put(
            self.params, param_shardings(self.mesh, self.params)
        )
        self.opt_state = jax.device_put(
            self.opt_state, replicated(self.mesh, self.opt_state)
        )
        return meta

    def _place_batch(self, batch: dict) -> dict:
        placed = {}
        for k, v in batch.items():
            spec = P("data", *([None] * (np.ndim(v) - 1)))
            placed[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return placed

    def update(self, batch: dict):
        b = batch["labels"].shape[0]
        if b % self.mesh.shape["data"] == 0:
            batch = self._place_batch(batch)
        return super().update(batch)

    def predict_batch(self, batch: dict):
        b = batch["labels"].shape[0]
        if b % self.mesh.shape["data"] == 0:
            batch = self._place_batch(batch)
        return super().predict_batch(batch)

    def evaluate(self, batches):
        def place(it):
            for batch in it:
                b = batch["labels"].shape[0]
                if b % self.mesh.shape["data"] == 0:
                    yield self._place_batch(batch)
                else:
                    yield batch

        return super().evaluate(place(batches))
