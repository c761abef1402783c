"""Auto-escalating solve: well-conditioned stays on Richardson; kappa=1e6
under bf16 factors must detect divergence and escalate to fp32-quality
factors (the north-star failure-detection -> recovery path)."""

import numpy as np
import jax.numpy as jnp

from mpf_tpu.models.refine import solve
from mpf_tpu.precision import MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import solve_residual


def test_well_conditioned_no_escalation():
    n = 64
    a = matgen.hpl_ai_matrix(n, seed=0)
    b = np.ones(n, np.float32)
    x, info = solve(jnp.asarray(a), jnp.asarray(b), r=16, policy=MPF_BF16)
    assert info["path"] == "richardson"
    assert not info["diverged"]
    assert solve_residual(a, np.asarray(x), b) < 1e-6


def test_ill_conditioned_escalates():
    n = 64
    a = matgen.random_conditioned(n, kappa=1e6, seed=2)
    b = np.random.default_rng(3).random(n).astype(np.float32)
    x, info = solve(jnp.asarray(a), jnp.asarray(b), r=16, policy=MPF_BF16)
    assert info["diverged"]
    assert info["path"] in ("gmres_ir", "gmres_ir+mpf_ref_refactor")
    assert solve_residual(a, np.asarray(x), b) < 1e-5
