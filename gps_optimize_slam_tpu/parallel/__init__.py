"""Device-mesh scale-out: padded multi-sequence batching, sharded fusion,
and sequence parallelism (one trajectory's pose axis over the mesh)."""
