"""SeisBench PhaseNet weight-port parity.

Builds a torch mirror of seisbench.models.PhaseNet (the exact torch-module
layout whose ``state_dict`` `convert_seisbench_weights` consumes — the
reference uses it through the picker protocol, BPMF/dataset.py:1729-1736),
initializes it randomly, converts the state_dict, and asserts the Flax
`SeisBenchPhaseNet` forward equals the torch forward in float64.  This
pins down every fragile piece of the port: conv/tconv axis transposes,
the transposed-conv tap-axis reversal, BatchNorm eps, the stage-specific
down-path paddings, the up-path center crops, and the skip-concat order.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from seismic_bpmf_tpu.models.phasenet import (  # noqa: E402
    SeisBenchPhaseNet,
    convert_seisbench_weights,
    load_seisbench_checkpoint,
    make_picker,
    ps_channels,
)


class TorchSeisBenchPhaseNet(nn.Module):
    """Mirror of seisbench.models.PhaseNet (depth 5, kernel 7, stride 4)."""

    def __init__(self, in_channels=3, classes=3, depth=5, kernel_size=7,
                 stride=4, filters_root=8):
        super().__init__()
        self.depth = depth
        self.kernel_size = kernel_size
        self.stride = stride
        self.inc = nn.Conv1d(in_channels, filters_root, kernel_size,
                             padding=kernel_size // 2)
        self.in_bn = nn.BatchNorm1d(filters_root, eps=1e-3)
        self.down_branch = nn.ModuleList()
        self.up_branch = nn.ModuleList()
        last_filters = filters_root
        for i in range(depth):
            filters = int(2**i * filters_root)
            conv_same = nn.Conv1d(last_filters, filters, kernel_size,
                                  padding=kernel_size // 2, bias=False)
            last_filters = filters
            bn1 = nn.BatchNorm1d(filters, eps=1e-3)
            if i == depth - 1:
                conv_down, bn2 = None, None
            else:
                padding = 0 if i in (1, 2, 3) else kernel_size // 2
                conv_down = nn.Conv1d(filters, filters, kernel_size,
                                      stride, padding=padding, bias=False)
                bn2 = nn.BatchNorm1d(filters, eps=1e-3)
            self.down_branch.append(
                nn.ModuleList([conv_same, bn1, conv_down, bn2])
            )
        for i in range(depth - 1):
            filters = int(2 ** (depth - 2 - i) * filters_root)
            conv_up = nn.ConvTranspose1d(last_filters, filters, kernel_size,
                                         stride, bias=False)
            last_filters = filters
            bn1 = nn.BatchNorm1d(filters, eps=1e-3)
            conv_same = nn.Conv1d(2 * filters, filters, kernel_size,
                                  padding=kernel_size // 2, bias=False)
            bn2 = nn.BatchNorm1d(filters, eps=1e-3)
            self.up_branch.append(
                nn.ModuleList([conv_up, bn1, conv_same, bn2])
            )
        self.out = nn.Conv1d(last_filters, classes, 1)

    def forward(self, x):
        act = torch.relu
        x = act(self.in_bn(self.inc(x)))
        skips = []
        for i, (conv_same, bn1, conv_down, bn2) in enumerate(
            self.down_branch
        ):
            x = act(bn1(conv_same(x)))
            if conv_down is not None:
                skips.append(x)
                if i == 1:
                    x = F.pad(x, (2, 3), "constant", 0)
                elif i == 2:
                    x = F.pad(x, (1, 3), "constant", 0)
                elif i == 3:
                    x = F.pad(x, (2, 3), "constant", 0)
                x = act(bn2(conv_down(x)))
        for (conv_up, bn1, conv_same, bn2), skip in zip(
            self.up_branch, skips[::-1]
        ):
            x = act(bn1(conv_up(x)))
            off = (x.shape[-1] - skip.shape[-1]) // 2
            x = x[:, :, off : off + skip.shape[-1]]
            x = torch.cat([skip, x], dim=1)
            x = act(bn2(conv_same(x)))
        return torch.softmax(self.out(x), dim=1)


def _random_torch_model(seed=0):
    torch.manual_seed(seed)
    tm = TorchSeisBenchPhaseNet().double()
    # random (nonzero) running stats + affine so BN conversion is exercised
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.3, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.2, generator=g)
    tm.eval()
    return tm


def test_convert_seisbench_weights_forward_parity():
    tm = _random_torch_model()
    variables = convert_seisbench_weights(tm.state_dict())

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 3001))
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()  # (2, 3, 3001)

    model = SeisBenchPhaseNet()
    with jax.enable_x64(True):
        vars64 = jax.tree.map(
            lambda a: np.asarray(a, np.float64), variables
        )
        y_j = np.asarray(
            model.apply(vars64, np.transpose(x, (0, 2, 1)), train=False)
        ).transpose(0, 2, 1)

    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=1e-10)


def test_converted_picker_protocol():
    """Converted model through make_picker: (n_sta, 3, n_t) ->
    (n_sta, 2, n_t) with the SeisBench NPS class order unscrambled."""
    tm = _random_torch_model(seed=3)
    variables = convert_seisbench_weights(tm.state_dict())
    model = SeisBenchPhaseNet()
    assert ps_channels(model) == (1, 2)  # (noise, P, S) ordering

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 4000)).astype(np.float32)
    picker = make_picker(model, variables)
    probas = picker(x)
    assert probas.shape == (2, 2, 4000)
    assert np.isfinite(probas).all()
    assert (probas >= 0).all() and (probas <= 1).all()


def test_load_seisbench_checkpoint_npz(tmp_path):
    tm = _random_torch_model(seed=5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    path = tmp_path / "phasenet.npz"
    np.savez(path, **sd)
    model, variables = load_seisbench_checkpoint(str(path))
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 3001, 3)).astype(np.float32)
    y = np.asarray(model.apply(variables, x, train=False))
    assert y.shape == (1, 3001, 3)
    np.testing.assert_allclose(np.sum(y, axis=-1), 1.0, atol=1e-5)
