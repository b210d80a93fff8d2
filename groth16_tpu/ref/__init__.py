"""Exact-arithmetic (Python int) reference engine.

This sub-package is the ground truth the TPU engine is validated against:
a from-scratch implementation of the same math contract the reference crate
delegates to `ark-ff`/`ark-ec`/`ark-poly` (see SURVEY.md §2.2/§2.3).  It is
deliberately simple and slow; the hot paths live in the JAX/Pallas engine.
"""
