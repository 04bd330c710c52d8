"""Neural network models as pure-functional JAX programs.

Each model is (init_params | params_from_torch) + apply functions operating
on padded, batch-first arrays — jit/vmap/shard_map friendly, with torch
state-dict converters for pretrained-weight parity with the reference's
vendored networks.
"""
