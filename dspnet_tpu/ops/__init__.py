"""Fixed-shape on-device detection ops (TPU-native equivalents of the
reference's custom C++/CUDA MXNet operators, reference operator/*.cc|cu)."""
