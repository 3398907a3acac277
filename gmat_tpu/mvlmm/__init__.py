"""Multivariate LMM — declared-but-empty in the reference
(/root/reference/gmat/mvlmm/__init__.py is 0 bytes); kept as an importable
placeholder for API parity."""
