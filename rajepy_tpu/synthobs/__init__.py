"""CASA-free synthetic interferometric observations (placeholder import)."""
