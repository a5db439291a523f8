"""Host-side utilities: numpy geometry, visualization, galleries, IO."""
