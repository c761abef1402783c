"""2D block-cyclic matrix layout over a (P, Q) process grid.

[north-star addition — the reference is single-GPU, `MPF.cu:77`]

Global block (I, J) of size b x b is owned by device (I mod P, J mod Q) —
the ScaLAPACK/HPL layout, chosen so every device owns work in every panel
step (load balance as the trailing submatrix shrinks).

Host-side representation: a (P, Q, H, W) array (H = (nb/P)*b local rows,
W = (nb/Q)*b local cols) sharded ``P('p', 'q', None, None)`` over the mesh;
device (p, q)'s local tile is a 2D matrix in "block-row cyclic" flattening:

  local row l  <->  global row ((l // b) * P + p) * b + (l % b)
  local col c  <->  global col ((c // b) * Q + q) * b + (c % b)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mpf_tpu.parallel.mesh import ROW_AXIS, COL_AXIS


def check_dims(n: int, b: int, p: int, q: int):
    nb, rem = divmod(n, b)
    if rem:
        raise ValueError(f"n={n} not divisible by block size b={b}")
    if nb % p or nb % q:
        raise ValueError(f"block count nb={nb} not divisible by grid {p}x{q}")
    return nb


def to_block_cyclic(a: jnp.ndarray, p: int, q: int, b: int) -> jnp.ndarray:
    """(N, N) global -> (P, Q, H, W) block-cyclic tiles."""
    n = a.shape[0]
    nb = check_dims(n, b, p, q)
    nlp, nlq = nb // p, nb // q
    # g_row = (i_l * P + pp) * b + off  ->  axes (i_l, pp, off)
    t = a.reshape(nlp, p, b, nlq, q, b)
    t = t.transpose(1, 4, 0, 2, 3, 5)  # (P, Q, i_l, off_r, j_l, off_c)
    return t.reshape(p, q, nlp * b, nlq * b)


def from_block_cyclic(t: jnp.ndarray, n: int, b: int) -> jnp.ndarray:
    """(P, Q, H, W) block-cyclic tiles -> (N, N) global."""
    p, q, h, w = t.shape
    nlp, nlq = h // b, w // b
    t = t.reshape(p, q, nlp, b, nlq, b)
    t = t.transpose(2, 0, 3, 4, 1, 5)  # (i_l, P, off_r, j_l, Q, off_c)
    return t.reshape(n, n)


def shard_block_cyclic(a: jnp.ndarray, mesh, b: int) -> jnp.ndarray:
    """Distribute a global matrix onto the mesh in block-cyclic layout."""
    p, q = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
    tiles = to_block_cyclic(a, p, q, b)
    sharding = NamedSharding(mesh, P(ROW_AXIS, COL_AXIS, None, None))
    return jax.device_put(tiles, sharding)


def local_row_indices(h: int, b: int, p: int, pp) -> jnp.ndarray:
    """Global row index of each local row (traced device coordinate ``pp``)."""
    l = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    return ((l // b) * p + pp) * b + (l % b)


def local_col_indices(w: int, b: int, q: int, qq) -> jnp.ndarray:
    """Global col index of each local col (traced device coordinate ``qq``)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0]
    return ((c // b) * q + qq) * b + (c % b)


def owner_local_row(g, b: int, p: int):
    """(owner p, local row index) of a global row index (all traced)."""
    blk = g // b
    return blk % p, (blk // p) * b + (g % b)
