"""Training: losses, LR schedules, MXNet-convention SGD, jitted train step,
data-parallel solver."""
