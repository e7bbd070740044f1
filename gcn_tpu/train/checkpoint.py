"""Checkpointing: params + optimizer state + config + step metadata.

Fixes the reference's gap where optimizer state is silently dropped
(``model/trainer.py:40-49`` saves only weights; the optimizer-aware variant
at ``utils/torch_utils.py:133-154`` is dead code).  A checkpoint here is a
directory:

    <dir>/params.msgpack      flax-serialized parameter tree
    <dir>/opt_state.msgpack   optimizer state (optional)
    <dir>/meta.json           config dict + epoch/step + vocab size

Writes are atomic (tmp dir + rename) so a preempted TPU job never leaves a
torn checkpoint behind — the elastic-recovery contract SURVEY.md §5 asks
for.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any, Optional

import jax
from flax import serialization

_async_lock = threading.Lock()
_async_thread: Optional[threading.Thread] = None


def save_checkpoint(
    directory: str,
    params: Any,
    opt_state: Any = None,
    config: Optional[dict] = None,
    meta: Optional[dict] = None,
    async_save: bool = False,
) -> None:
    """Atomic checkpoint write (tmp dir + rename).

    ``async_save=True`` fetches the state to host synchronously (cheap —
    device→host DMA of a few MB) and runs serialization + file IO on a
    background thread so the train loop never blocks on disk.  Writes are
    serialized with a lock; call ``wait_for_async_saves()`` before reading
    a checkpoint back or exiting.
    """
    params = jax.device_get(params)
    if opt_state is not None:
        opt_state = jax.device_get(opt_state)

    def write():
        with _async_lock:
            d = os.path.abspath(directory)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            tmp = d + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            with open(os.path.join(tmp, "params.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(params))
            if opt_state is not None:
                with open(os.path.join(tmp, "opt_state.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(opt_state))
            blob = {"config": config or {}, "meta": meta or {}}
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump(blob, f, indent=2, default=str)
            if os.path.exists(d):
                shutil.rmtree(d)
            os.rename(tmp, d)

    if async_save:
        global _async_thread
        t = threading.Thread(target=write, daemon=True)
        _async_thread = t
        t.start()
    else:
        write()


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint write has landed."""
    t = _async_thread
    if t is not None:
        t.join()


def load_checkpoint(
    directory: str,
    params_template: Any,
    opt_state_template: Any = None,
) -> tuple[Any, Any, dict]:
    """Restore into the given templates (shapes/dtypes must match).
    Returns (params, opt_state_or_None, meta_blob)."""
    with open(os.path.join(directory, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    opt_state = None
    opt_path = os.path.join(directory, "opt_state.msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = serialization.from_bytes(
                opt_state_template, f.read()
            )
    with open(os.path.join(directory, "meta.json")) as f:
        blob = json.load(f)
    return params, opt_state, blob


def load_checkpoint_config(directory: str) -> dict:
    with open(os.path.join(directory, "meta.json")) as f:
        return json.load(f)["config"]
