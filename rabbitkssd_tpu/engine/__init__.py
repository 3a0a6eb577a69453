"""Pipelines: sketching, distance, set ops — the subcommand engines."""
