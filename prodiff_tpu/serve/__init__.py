"""HTTP serving (mirrors ``handler/web``)."""
