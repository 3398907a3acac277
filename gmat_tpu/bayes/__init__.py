"""Bayesian alphabet — declared-but-empty in the reference
(/root/reference/gmat/bayes/{__init__.py,bayesA.py} are 0 bytes); kept as an
importable placeholder for API parity."""
