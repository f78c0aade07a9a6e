"""dedup queries — populated in later phases."""
