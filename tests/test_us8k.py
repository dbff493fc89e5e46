"""UrbanSound8K datamodule: 10 official folds, same pipeline machinery."""

import numpy as np
import pytest

from dlsc_tpu.data import US8KDataModule
from dlsc_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def us8k_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("us8k")
    make_synthetic_dataset(root, num_classes=10, clips_per_class_per_fold=2,
                           n_folds=10, clip_samples=8000)
    return root


def test_us8k_ten_folds(us8k_root):
    dm = US8KDataModule(
        root=str(us8k_root), num_classes=10, fold=9, val_split=0.2,
        batch_size=16, preprocessing_mode="ast", is_spectrogram=True,
    )
    sizes = dm.setup_sizes()
    assert sizes["test"] == 20
    assert sizes["train"] + sizes["val"] == 180  # 9 remaining folds
    with pytest.raises(ValueError, match="fold"):
        US8KDataModule(root=str(us8k_root), num_classes=10, fold=10)


@pytest.mark.slow
def test_us8k_trains(us8k_root):
    import flax.linen as nn

    from dlsc_tpu.train import Trainer
    from dlsc_tpu.train.optim import adam

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(4, (5, 5), (4, 4))(x[..., None])
            return nn.Dense(10)(x.reshape(x.shape[0], -1))

    dm = US8KDataModule(
        root=str(us8k_root), num_classes=10, fold=0, val_split=0.2,
        batch_size=16, preprocessing_mode="ast", is_spectrogram=True,
    )
    trainer = Trainer(max_epochs=2, enable_progress_bar=False,
                      enable_checkpointing=False, seed=0)
    trainer.fit(M(), dm, adam(lr=1e-3))
    assert "val/acc" in trainer.logged_metrics
