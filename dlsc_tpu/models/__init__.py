"""Flax model zoo: the six reference model families, TPU-first, plus the
beyond-reference AST-MoE (mixture-of-experts, models/moe.py).

All models are ``flax.linen`` modules with the signature
``__call__(x, train: bool)`` returning logits (or sigmoid probabilities for
the AST family — a reference quirk preserved for parity, see
reference: src/models/ast.py:63).
"""

from dlsc_tpu.models.envnet_v2 import EnvNetV2
from dlsc_tpu.models.ast import ASTModel
from dlsc_tpu.models.ast_small import ASTViTSmall
from dlsc_tpu.models.ast_mini import ASTMiniViT
from dlsc_tpu.models.ast_moe import ASTMoE
from dlsc_tpu.models.leaf import LeafModel
from dlsc_tpu.models.cnn_esc50 import CNN_ESC50

__all__ = [
    "EnvNetV2",
    "ASTModel",
    "ASTViTSmall",
    "ASTMiniViT",
    "ASTMoE",
    "LeafModel",
    "CNN_ESC50",
]
