"""Pipeline checkpointing / lineage / metrics (resumable batch pipelines)."""
