"""Pallas TPU kernels for the pipeline's hot ops."""
