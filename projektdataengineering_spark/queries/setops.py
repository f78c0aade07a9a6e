"""setops queries — populated in later phases."""
