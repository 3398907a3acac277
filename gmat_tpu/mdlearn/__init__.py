"""ML add-ons — declared-but-empty in the reference
(/root/reference/gmat/mdlearn/__init__.py is 0 bytes); kept as an importable
placeholder for API parity."""
