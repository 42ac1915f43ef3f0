"""Batched device kernels (jnp/XLA + Pallas).

Every op here is shape-static, batched over a leading frame/tile/block
dimension, and runs under jit on TPU (with identical semantics on the CPU
backend used by the test mesh). Pallas variants are selected on TPU where
they beat plain XLA; the jnp path is the semantic reference.
"""
