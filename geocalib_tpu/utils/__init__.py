"""Utilities: conversions, image preprocessing, metric tools."""
