"""Host-side utilities (L0 of the layer map in SURVEY.md §1)."""
