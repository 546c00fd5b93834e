"""I/O: checkpointed pipelines, per-partition metrics, image payloads."""
