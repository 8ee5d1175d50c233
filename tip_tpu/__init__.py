"""tip_tpu — TPU-native Transformer Inertial Poser framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jyf588/transformer-inertial-poser (SIGGRAPH Asia 2022): real-time human motion
reconstruction from 6 sparse IMUs with stationary-body-point (SBP) drift
correction and simultaneous terrain estimation.

Layering (bottom-up):
  chars/    character/skeleton configuration as *data* (reference: amass_char_info.py)
  ops/      pure-math JAX kernels: rotations, FK, IMU features, SBP, IK, metrics
  models/   the causal transformer + RNN state predictor and its losses
  runtime/  the streaming runner as a pure (carry, x) -> (carry, y) scan step
  train/    pjit data-parallel training, windowed sampling, checkpointing
  data_gen/ AMASS synthesis + DIP preprocessing + blob packing
  parallel/ device-mesh and sharding utilities
  utils/    URDF parsing and misc host-side helpers
"""

__version__ = "0.1.0"
