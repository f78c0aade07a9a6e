"""udfs queries — populated in later phases."""
