"""Dataflow operators beyond the reference's relational surface: dedup,
similarity search, text analysis — the training-data-pipeline layer."""
