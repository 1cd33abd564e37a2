"""humanoid_tpu: TPU-native humanoid RL training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
humanoid-gym reference stack (Isaac Gym PhysX + torch PPO): batched
articulated rigid-body physics, the XBot-L walking task, a fused PPO
trainer, multi-chip env-axis sharding, and a MuJoCo sim2sim deployment gate.
"""

__version__ = "0.1.0"
