"""Offline dataset-preparation tools (CPU)."""
