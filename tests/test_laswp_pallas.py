"""Pallas DMA row-exchange kernel (LASWP analogue) in interpreter mode."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpf_tpu.ops.panel_pallas import laswp_apply


def test_laswp_matches_gather(rng):
    n, w = 64, 256
    slab = rng.random((n, w)).astype(np.float32)
    cand = np.array([0, 1, 2, 3, 17, 33, 2, 5], dtype=np.int32)  # dup cand=2
    src = np.array([17, 33, 5, 3, 0, 1, 5, 2], dtype=np.int32)   # dup carries same src
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(laswp_apply(jnp.asarray(slab), jnp.asarray(cand), jnp.asarray(src)))
    want = slab.copy()
    want[cand] = slab[src]
    # interpret mode does not initialize the aliased output buffer, so only
    # the exchanged rows are defined there (hardware aliasing preserves the
    # rest; that path is exercised on the real chip by tools/tpu_validate.py)
    np.testing.assert_array_equal(got[cand], want[cand])
