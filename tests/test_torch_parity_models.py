"""Numerical architecture-parity: Flax EnvNetV2 / LEAF vs torch replicas.

Builds torch models with the reference's exact layer structure
(reference: src/models/envnet_v2.py:5-90, src/models/leaf.py:7-104), copies
the Flax parameters into them, and compares eval-mode forwards. This pins
the architectures themselves (strides, pooling, the channel→frequency swap,
Gabor/PCEN math), independent of initialization.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dlsc_tpu.models import EnvNetV2, LeafModel


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TorchEnvNetV2(nn.Module):
    """Reference EnvNet-v2 structure (envnet_v2.py), eval mode."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.c1 = nn.Conv2d(1, 32, (1, 64), (1, 2))
        self.b1 = nn.BatchNorm2d(32)
        self.c2 = nn.Conv2d(32, 64, (1, 16), (1, 2))
        self.b2 = nn.BatchNorm2d(64)
        blocks = []
        for cin, cout, k1, k2, pool in (
            (1, 32, (8, 8), (8, 8), (5, 3)),
            (32, 64, (1, 4), (1, 4), (1, 2)),
            (64, 128, (1, 2), (1, 2), (1, 2)),
            (128, 256, (1, 2), (1, 2), (1, 2)),
        ):
            blocks.append(nn.ModuleDict({
                "ca": nn.Conv2d(cin, cout, k1),
                "ba": nn.BatchNorm2d(cout),
                "cb": nn.Conv2d(cout, cout, k2),
                "bb": nn.BatchNorm2d(cout),
            }))
            blocks[-1].pool = pool
        self.blocks = nn.ModuleList(blocks)
        self.pools = [(5, 3), (1, 2), (1, 2), (1, 2)]
        self.fc1 = nn.Linear(256 * 10 * 33, 4096)
        self.fc2 = nn.Linear(4096, 4096)
        self.fc3 = nn.Linear(4096, num_classes)

    @torch.no_grad()
    def forward(self, x):  # (B, 1, 1, T)
        x = F.relu(self.b1(self.c1(x)))
        x = F.relu(self.b2(self.c2(x)))
        x = F.max_pool2d(x, (1, 64), (1, 64))
        x = x.transpose(1, 2)  # channels → frequency
        for blk, pool in zip(self.blocks, self.pools):
            x = F.relu(blk["ba"](blk["ca"](x)))
            x = F.relu(blk["bb"](blk["cb"](x)))
            x = F.max_pool2d(x, pool, pool)
        x = x.flatten(1)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.fc3(x)


def _copy_conv(tconv, fconv):
    # flax HWIO → torch OIHW
    tconv.weight.copy_(_t(fconv["kernel"]).permute(3, 2, 0, 1))
    tconv.bias.copy_(_t(fconv["bias"]))


def _copy_bn(tbn, fbn_params, fbn_stats):
    tbn.weight.copy_(_t(fbn_params["scale"]))
    tbn.bias.copy_(_t(fbn_params["bias"]))
    tbn.running_mean.copy_(_t(fbn_stats["mean"]))
    tbn.running_var.copy_(_t(fbn_stats["var"]))


@pytest.mark.slow
def test_envnet_forward_parity():
    model = EnvNetV2(num_classes=10)
    x = np.random.default_rng(0).standard_normal((2, 220_500)).astype(np.float32) * 0.2
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    p, bs = variables["params"], variables["batch_stats"]
    tm = TorchEnvNetV2(10).eval()
    with torch.no_grad():
        # front-end: _ConvBNRelu_0/_ConvBNRelu_1
        _copy_conv(tm.c1, p["_ConvBNRelu_0"]["Conv_0"])
        _copy_bn(tm.b1, p["_ConvBNRelu_0"]["BatchNorm_0"], bs["_ConvBNRelu_0"]["BatchNorm_0"])
        _copy_conv(tm.c2, p["_ConvBNRelu_1"]["Conv_0"])
        _copy_bn(tm.b2, p["_ConvBNRelu_1"]["BatchNorm_0"], bs["_ConvBNRelu_1"]["BatchNorm_0"])
        for i in range(4):
            a, b = f"_ConvBNRelu_{2 + 2 * i}", f"_ConvBNRelu_{3 + 2 * i}"
            _copy_conv(tm.blocks[i]["ca"], p[a]["Conv_0"])
            _copy_bn(tm.blocks[i]["ba"], p[a]["BatchNorm_0"], bs[a]["BatchNorm_0"])
            _copy_conv(tm.blocks[i]["cb"], p[b]["Conv_0"])
            _copy_bn(tm.blocks[i]["bb"], p[b]["BatchNorm_0"], bs[b]["BatchNorm_0"])
        # classifier: flax flattens NHWC (B,10,33,256); torch flattens NCHW
        # (B,256,10,33) → permute the fc1 input weights accordingly
        w = _t(p["Dense_0"]["kernel"])           # (10*33*256, 4096)
        w = w.reshape(10, 33, 256, 4096).permute(2, 0, 1, 3).reshape(256 * 10 * 33, 4096)
        tm.fc1.weight.copy_(w.T)
        tm.fc1.bias.copy_(_t(p["Dense_0"]["bias"]))
        tm.fc2.weight.copy_(_t(p["Dense_1"]["kernel"]).T)
        tm.fc2.bias.copy_(_t(p["Dense_1"]["bias"]))
        tm.fc3.weight.copy_(_t(p["Dense_2"]["kernel"]).T)
        tm.fc3.bias.copy_(_t(p["Dense_2"]["bias"]))

    theirs = tm(_t(x).reshape(2, 1, 1, -1)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_leaf_gabor_pcen_parity():
    """Gabor energy + downsample + PCEN vs the reference math in torch
    (leaf.py:7-58), same parameters."""
    from dlsc_tpu.models.leaf import GaborConv1d, PCEN

    n_filters, k, sr = 8, 101, 44100
    x = np.random.default_rng(1).standard_normal((2, 8000)).astype(np.float32) * 0.3

    gab = GaborConv1d(n_filters, k, sr)
    v = gab.init(jax.random.key(0), jnp.asarray(x))
    ours_energy = np.asarray(gab.apply(v, jnp.asarray(x)))  # (B, T, F)

    center = torch.from_numpy(np.asarray(v["params"]["center_freqs"]))
    bw = torch.from_numpy(np.asarray(v["params"]["bandwidths"]))
    t = torch.arange(-(k // 2), k // 2 + 1, dtype=torch.float32) / sr
    window = torch.hann_window(k, periodic=True)
    env = torch.exp(-0.5 * (t[None] * bw[:, None] * sr) ** 2)
    real = (torch.cos(2 * np.pi * center[:, None] * t[None]) * env * window)[:, None, :]
    imag = (torch.sin(2 * np.pi * center[:, None] * t[None]) * env * window)[:, None, :]
    xt = _t(x)[:, None, :]
    theirs_energy = (
        F.conv1d(xt, real, padding=k // 2) ** 2
        + F.conv1d(xt, imag, padding=k // 2) ** 2
    ).numpy()  # (B, F, T)
    np.testing.assert_allclose(
        ours_energy.transpose(0, 2, 1), theirs_energy, atol=1e-4, rtol=1e-4
    )

    # PCEN on the downsampled energy (avg-pool smoother, alpha unused)
    pooled = F.avg_pool1d(torch.from_numpy(theirs_energy), 160, 160)
    pc = PCEN(n_filters)
    pv = pc.init(jax.random.key(0), jnp.asarray(pooled.numpy().transpose(0, 2, 1)))
    ours_pcen = np.asarray(pc.apply(pv, jnp.asarray(pooled.numpy().transpose(0, 2, 1))))
    delta = torch.from_numpy(np.asarray(pv["params"]["delta"]))
    r = torch.from_numpy(np.asarray(pv["params"]["r"]))
    m = F.avg_pool1d(pooled, 5, 1, 2)
    theirs_pcen = ((pooled / (1e-6 + m) ** r[None, :, None]) + delta[None, :, None]).log()
    np.testing.assert_allclose(
        ours_pcen.transpose(0, 2, 1), theirs_pcen.numpy(), atol=1e-4, rtol=1e-4
    )
