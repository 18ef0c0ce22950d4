"""Table loaders and deterministic synthetic spatial/image columns."""
