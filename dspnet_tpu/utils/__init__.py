"""Utilities: checkpointing, logging, profiling, golden shape tables."""
