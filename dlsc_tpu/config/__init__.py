"""Config system: YAML composition, interpolation, CLI overrides, instantiate.

Replicates the Hydra/OmegaConf workflow the reference relies on
(reference: configs/training.yaml:22-26, scripts/train.py:56-61) without
depending on Hydra (not available in this environment). Supports:

- defaults-list composition (``- base_training``, ``- dataset: esc50``,
  ``- _self_``, ``- override hydra/...`` entries are ignored),
- ``${a.b.c}`` interpolation and ``${now:%Y-%m-%d}`` resolvers,
- dotted-path CLI overrides (``a.b=v``, ``+new.key=v``, ``~del.key``,
  group overrides like ``model=envnet_v2``),
- ``_target_`` object instantiation with a compatibility alias table so
  reference-style targets (``src.models...``, ``torch.optim.Adam``) resolve
  to dlsc_tpu equivalents.
"""

from dlsc_tpu.config.core import Config, merge, flatten
from dlsc_tpu.config.compose import compose, load_yaml, parse_overrides
from dlsc_tpu.config.instantiate import instantiate, resolve_target

__all__ = [
    "Config",
    "merge",
    "flatten",
    "compose",
    "load_yaml",
    "parse_overrides",
    "instantiate",
    "resolve_target",
]
