"""streaming_batch queries — populated in later phases."""
