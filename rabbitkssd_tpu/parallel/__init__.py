"""Multi-chip execution: meshes, shard_map pipelines, collectives."""
