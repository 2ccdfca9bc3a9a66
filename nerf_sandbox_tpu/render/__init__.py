"""Rendering subsystem: tiled eval renderer, path poses, validation, video IO."""
