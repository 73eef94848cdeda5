"""Functional, jittable array ops — the TPU compute core.

Everything in this package is pure-functional over JAX arrays with static
shapes: sketches are struct-of-arrays batches, updates return new state.
The object facades in :mod:`datasketch_tpu.models` wrap these.
"""
