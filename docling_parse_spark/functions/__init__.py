"""Column-level functions for training-data pipelines (JVM-side where possible)."""
