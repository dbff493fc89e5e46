"""dlsc_tpu — TPU-native environmental sound classification framework.

A from-scratch JAX/Flax/Pallas/pjit rebuild of the capabilities of the
PyTorch Lightning reference stack (youssefg7/dl-sound-classification):
six model families on ESC-50 / UrbanSound8K, a fused on-device log-mel
front-end, device-side augmentation, config composition, experiment
tracking, Orbax checkpointing, and TPE+Hyperband hyperparameter search.
"""

__version__ = "0.1.0"
