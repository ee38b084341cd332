"""radar-camera-fusion-depth_tpu: TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of nesl/radar-camera-fusion-depth (CVPR 2023)."""

__version__ = '0.1.0'
