"""crb_active_3ddet_tpu — TPU-native (JAX/XLA/Pallas) re-implementation of the
capabilities of Luoyadan/CRB-active-3Ddet (OpenPCDet v0.5.2 + CRB active
learning, ICLR 2023).

Design stance (see SURVEY.md §7): fixed shapes + validity masks everywhere,
functional Flax models over a ``batch_dict`` of padded arrays, jitted batched
acquisition passes, and ``jax.sharding`` data parallelism instead of DDP.
"""

__version__ = '0.1.0'
