"""map_batches stage definitions (stateless tasks + actor-pool classes)."""
