"""L2: factorization drivers ("model families").

``mpf``     — single-chip blocked mixed-precision pre-pivoting LU (the
              reference's `MPF()` entry point, `MPF.cu:66-256`)
``solve``   — triangular solves / getrs on the packed factors
``refine``  — HPL-AI-style iterative refinement (north-star addition)
``batched`` — vmapped batched factorization (north-star addition)
"""
