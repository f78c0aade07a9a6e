"""similarity queries — populated in later phases."""
