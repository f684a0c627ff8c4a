"""TPU compute ops: on-device sampling, quantized matmuls, Pallas kernels."""
