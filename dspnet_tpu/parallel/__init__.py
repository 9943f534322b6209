"""Device-mesh parallelism: batch-sharded data parallel via jit + NamedSharding."""
