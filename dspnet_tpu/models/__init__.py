"""Flax model zoo: backbones, SSD/multitask heads, PSP seg head, factory."""
