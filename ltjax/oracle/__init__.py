"""Frozen NumPy float64 reference-semantics implementations.

These are the test oracles (SURVEY.md SS4): deliberately written with
*different algorithms* from the production JAX code (dense solves, brute
force) so that agreement is meaningful.  Do not optimize these.
"""
