"""flax.linen model zoo (L1 of the layer map in SURVEY.md §1)."""
