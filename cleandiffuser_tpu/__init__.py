"""cleandiffuser_tpu — a TPU-native diffusion-decision-making framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
CleanDiffuserTeam/CleanDiffuser: modular diffusion models for decision
making (planners, policies, data synthesizers) with classifier and
classifier-free guidance, a full solver zoo compiled into fused `lax.scan`
programs, and `shard_map` data/model parallelism over TPU meshes.
"""

__version__ = "0.1.0"
