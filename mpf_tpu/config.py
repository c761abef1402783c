"""Runtime configuration knobs (env-var driven).

``MPF_USE_PALLAS``: "auto" (default — Pallas kernels on TPU, jnp reference
kernels elsewhere), "1" (force Pallas, interpret-mode on CPU), "0" (force
the jnp reference kernels everywhere).
"""

from __future__ import annotations

import os

import jax

_USE_PALLAS = os.environ.get("MPF_USE_PALLAS", "auto")


def use_pallas() -> bool:
    if _USE_PALLAS == "1":
        return True
    if _USE_PALLAS == "0":
        return False
    return jax.default_backend() == "tpu"
