"""joins queries — populated in later phases."""
