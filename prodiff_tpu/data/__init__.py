"""Host-side data pipeline: datasets, batching, collation."""
