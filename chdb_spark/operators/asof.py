"""placeholder — filled in milestone 3."""
