"""Inference API: multitask detector with visualization."""
