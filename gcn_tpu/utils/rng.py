"""PRNG implementation selection.

Dropout-mask generation is pure VPU work and the default threefry2x32
generator is expensive on TPU: profiling the flagship train step
(B=50, N=96, five dropout mechanisms) attributes ~0.6 ms/step to threefry
bit-generation fusions.  TPU has a hardware RNG that JAX exposes as the
``rbg`` implementation — same key/split/fold_in API, deterministic per
key, ~entirely free at this scale (measured: 2.63 → 2.01 ms/step).

``configure_prng`` must run before any ``jax.random.key`` is created.
"""

from __future__ import annotations

import jax


def configure_prng(impl: str = "auto") -> str:
    """Set the global default PRNG implementation.

    impl: "threefry" | "rbg" | "auto" (= rbg on TPU — the measured win —
    and threefry elsewhere, keeping CPU tests on the JAX default).
    Returns the implementation chosen.
    """
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl not in ("threefry", "rbg", "unsafe_rbg"):
        raise ValueError(f"unknown prng impl: {impl}")
    jax.config.update(
        "jax_default_prng_impl",
        "threefry2x32" if impl == "threefry" else impl,
    )
    return impl
