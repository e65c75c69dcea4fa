"""The Spark engine: UDF surface, spatial joins, skew handling, checkpoints."""
