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


def __getattr__(name):
    """Lazy convenience re-exports (kept lazy so `import tip_tpu` stays
    cheap and jax-config-order-agnostic)."""
    from importlib import import_module

    table = {
        "ModelConfig": ("tip_tpu.models.tip_model", "ModelConfig"),
        "forward": ("tip_tpu.models.tip_model", "forward"),
        "init_params": ("tip_tpu.models.tip_model", "init_params"),
        "RunnerConfig": ("tip_tpu.runtime.runner", "RunnerConfig"),
        "runner_init": ("tip_tpu.runtime.runner", "runner_init"),
        "runner_step": ("tip_tpu.runtime.runner", "runner_step"),
        "run_offline": ("tip_tpu.runtime.runner", "run_offline"),
        "FullRunnerConfig": ("tip_tpu.runtime.full_runner", "FullRunnerConfig"),
        "StreamPool": ("tip_tpu.runtime.serving", "StreamPool"),
        "TrainConfig": ("tip_tpu.train.train", "TrainConfig"),
        "train_loop": ("tip_tpu.train.train", "train_loop"),
        "amass_skeleton": ("tip_tpu.ops.kinematics", "amass_skeleton"),
        "Skeleton": ("tip_tpu.ops.kinematics", "Skeleton"),
    }
    if name in table:
        mod, attr = table[name]
        return getattr(import_module(mod), attr)
    raise AttributeError(f"module 'tip_tpu' has no attribute {name!r}")
