"""windows queries — populated in later phases."""
