"""mhentropy_tpu — a TPU-native JAX framework for probabilistic multi-hypothesis
hand/body pose-and-shape recovery (the capabilities of GloryyrolG/MHEntropy,
ICCV 2023), built from scratch for JAX/XLA/Pallas/pjit.

Layering (bottom-up):
    core/      pure-JAX math: rotations, MANO forward kinematics, cameras
    flows/     conditional normalizing flows (RealNVP, Glow), priors, Pallas sampler
    models/    ResNet backbone + the MHEnt probabilistic model + RLE mode
    data/      host-side input pipelines (synthetic fixture, HO3D, RHD, FreiHAND)
    train/     training engine: TrainState, pjit step, metrics, checkpoints
    parallel/  device mesh + sharding policy (data x hypothesis axes)
    utils/     config system (yacs-compatible YAML), logging, PRNG helpers
"""

__version__ = "0.1.0"
