"""scalars queries — populated in later phases."""
