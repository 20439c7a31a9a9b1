"""Sources: deterministic pages synthesis, geotag extraction, table IO."""
