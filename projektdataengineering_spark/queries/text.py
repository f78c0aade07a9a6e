"""text queries — populated in later phases."""
