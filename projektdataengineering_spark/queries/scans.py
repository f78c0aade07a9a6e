"""scans queries — populated in later phases."""
