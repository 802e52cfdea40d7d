"""Numerics primitives: spectral bases, transfer operators, fast solvers, stencils."""
