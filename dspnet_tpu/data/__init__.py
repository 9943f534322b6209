"""Data pipeline: datasets (imdb family), deterministic augmentation,
multitask batch iterator, synthetic fixtures."""
