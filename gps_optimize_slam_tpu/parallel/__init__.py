"""Device-mesh scale-out: padded multi-sequence batching and sharded fusion."""
