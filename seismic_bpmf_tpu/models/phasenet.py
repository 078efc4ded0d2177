"""PhaseNet (Zhu & Beroza 2019) in Flax — the deep-learning phase picker.

The reference consumes SeisBench's torch PhaseNet through a picker-callable
protocol ``probas (n_sta, 2, n_t) = picker(x (n_sta, 3, n_t))``
(BPMF/dataset.py:1729-1736, 5_backprojection.ipynb `ml_detector`).  Here the
picker is a Flax module jit-compiled into the same XLA program as the rest of
the pipeline:

  - 1-D U-Net, depth 5, kernel 7, stride 4, filters 8..128, softmax over
    (P, S, noise);
  - `convert_seisbench_weights` maps a SeisBench torch ``state_dict`` onto
    the Flax parameter tree so published checkpoints can be reused;
  - `sliding_window_probas` applies the network over a long trace in
    overlapping 3001-sample windows with Z-score normalization
    (BPMF/utils.py:1966-2036 semantics) and averages the overlaps;
  - `train_step` provides supervised training (Gaussian-blurred pick labels,
    cross-entropy) with optax, shardable with `jax.sharding` for
    data-parallel training.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WINDOW = 3001  # samples @ 100 Hz, SeisBench 'original' convention


class ConvBlock(nn.Module):
    features: int
    kernel: int = 7
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel,), strides=(self.stride,),
            padding="SAME", use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class UpBlock(nn.Module):
    features: int
    kernel: int = 7
    stride: int = 4

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nn.ConvTranspose(
            self.features, (self.kernel,), strides=(self.stride,),
            padding="SAME", use_bias=False,
        )(x)
        # crop/pad to the skip length (stride-4 down/up paths misalign)
        n = skip.shape[1]
        if x.shape[1] > n:
            lo = (x.shape[1] - n) // 2
            x = x[:, lo : lo + n, :]
        elif x.shape[1] < n:
            pad = n - x.shape[1]
            x = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = jnp.concatenate([skip, x], axis=-1)
        x = ConvBlock(self.features, self.kernel)(x, train=train)
        return x


class PhaseNet(nn.Module):
    """1-D U-Net phase picker.

    Input (batch, n_samples, in_channels=3) -> (batch, n_samples, 3)
    softmax probabilities ordered (P, S, noise).
    """

    depth: int = 5
    filters_root: int = 8
    kernel: int = 7
    stride: int = 4
    n_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pad to a multiple of stride**(depth-1) so every down/up stage
        # divides exactly: the UpBlock crop/pad then never fires, keeping
        # the graph free of the slice+pad pattern that crashes XLA:TPU's
        # SpaceToBatchConverter on non-divisible lengths (e.g. 3001)
        n_in = x.shape[1]
        quantum = self.stride ** (self.depth - 1)
        n_pad = (-n_in) % quantum
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        filters = [self.filters_root * 2**i for i in range(self.depth)]
        x = ConvBlock(filters[0], self.kernel)(x, train=train)
        skips = []
        for i in range(1, self.depth):
            skips.append(x)
            x = ConvBlock(filters[i], self.kernel, self.stride)(x, train=train)
        for i in range(self.depth - 2, -1, -1):
            x = UpBlock(filters[i], self.kernel, self.stride)(
                x, skips[i], train=train
            )
        x = nn.Conv(self.n_classes, (1,), padding="SAME")(x)
        if n_pad:
            x = x[:, :n_in, :]
        return nn.softmax(x, axis=-1)


# ---------------------------------------------------------------------------
# picker-callable protocol
# ---------------------------------------------------------------------------

def init_phasenet(rng_key=None, window: int = WINDOW):
    """Initialize a PhaseNet and its variables (params + batch stats)."""
    model = PhaseNet()
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    variables = model.init(
        rng_key, jnp.zeros((1, window, 3), jnp.float32), train=False
    )
    return model, variables


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def _forward(apply_fn, variables, x):
    return apply_fn(variables, x, train=False)


@functools.partial(jax.jit, static_argnames=("apply_fn", "window"))
def _device_sliding(apply_fn, variables, x, starts, *, window):
    """Overlapping-window inference + overlap-averaging as ONE device
    program (lax.scan over window positions — no per-window dispatch)."""
    n_tr, n_ch, n = x.shape

    def body(carry, s):
        probas, counts = carry
        win = jax.lax.dynamic_slice(x, (0, 0, s), (n_tr, n_ch, window))
        out = apply_fn(variables, jnp.transpose(win, (0, 2, 1)),
                       train=False)  # (n_tr, window, 3)
        cur = jax.lax.dynamic_slice(probas, (0, s, 0), (n_tr, window, 3))
        probas = jax.lax.dynamic_update_slice(probas, cur + out, (0, s, 0))
        cc = jax.lax.dynamic_slice(counts, (s,), (window,))
        counts = jax.lax.dynamic_update_slice(counts, cc + 1.0, (s,))
        return (probas, counts), 0

    probas0 = jnp.zeros((n_tr, n, 3), jnp.float32)
    counts0 = jnp.zeros((n,), jnp.float32)
    (probas, counts), _ = jax.lax.scan(body, (probas0, counts0), starts)
    probas = probas / jnp.maximum(counts[None, :, None], 1.0)
    return jnp.transpose(probas, (0, 2, 1))


def phasenet_probas_device(
    model: PhaseNet,
    variables,
    x,
    window: int = WINDOW,
    overlap: float = 0.5,
    norm_window: int = 3000,
):
    """Day-long P/S/noise probabilities computed ENTIRELY on device.

    Same semantics as `sliding_window_probas` but the continuous data is
    uploaded once and normalization + all window forwards + overlap
    averaging run in one jitted program — the host-chunked path pays a
    device round trip per window batch, which dominates on a remote
    accelerator.  Returns a device array (n_traces, 3, n_samples); keep it
    device-resident when feeding the beamformer.
    """
    from ..ops.picks import normalize_batch

    x = jnp.asarray(x, jnp.float32)
    n_tr, n_ch, n = x.shape
    if n < window:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, window - n)))
        n = window
    x = normalize_batch(
        x, normalization_window_sample=min(norm_window, n)
    )
    shift = max(1, int(window * (1.0 - overlap)))
    starts = list(range(0, max(1, n - window + 1), shift))
    if starts[-1] + window < n:
        starts.append(n - window)
    starts = jnp.asarray(np.asarray(starts, np.int32))
    return _device_sliding(model.apply, variables, x, starts,
                           window=window)


def sliding_window_probas(
    model: PhaseNet,
    variables,
    x: np.ndarray,
    window: int = WINDOW,
    overlap: float = 0.5,
    norm_window: int = 3000,
    batch_windows: int = 64,
) -> np.ndarray:
    """Long-trace inference: Z-score-normalized overlapping windows,
    overlap-averaged probabilities.

    x : (n_traces, 3, n_samples) -> (n_traces, 3, n_samples) probas (P,S,N).

    Window positions are batched onto the leading axis (`batch_windows` per
    device call) — a day of continuous data is ~720 window positions, and
    one dispatch per position is launch-latency-bound on a remote
    accelerator.
    """
    from ..ops.picks import normalize_batch_np

    n_tr, n_ch, n = x.shape
    x = normalize_batch_np(
        np.asarray(x, np.float32),
        normalization_window_sample=min(norm_window, n),
    )
    shift = max(1, int(window * (1.0 - overlap)))
    starts = list(range(0, max(1, n - window + 1), shift))
    if starts[-1] + window < n:
        starts.append(n - window)
    probas = np.zeros((n_tr, n, 3), np.float32)
    counts = np.zeros(n, np.float32)
    # windows stacked on the batch axis: (n_chunk * n_tr, window, 3)
    n_chunk = max(1, batch_windows // max(n_tr, 1))
    for lo in range(0, len(starts), n_chunk):
        chunk = starts[lo : lo + n_chunk]
        # fixed batch shape (repeat the last start) so every chunk reuses
        # one compiled program
        padded = chunk + [chunk[-1]] * (n_chunk - len(chunk))
        wins = np.zeros((n_chunk, n_tr, window, n_ch), np.float32)
        for j, s in enumerate(padded):
            w = x[:, :, s : s + window]
            wins[j, :, : w.shape[-1], :] = w.transpose(0, 2, 1)
        out = np.asarray(
            _forward(model.apply, variables,
                     jnp.asarray(wins.reshape(-1, window, n_ch)))
        ).reshape(n_chunk, n_tr, window, 3)
        for j, s in enumerate(chunk):
            n_eff = min(window, n - s)
            probas[:, s : s + n_eff, :] += out[j, :, :n_eff, :]
            counts[s : s + n_eff] += 1.0
    probas /= np.maximum(counts[None, :, None], 1.0)
    return probas.transpose(0, 2, 1)


def make_picker(model: PhaseNet, variables, **kwargs):
    """Build the reference-protocol picker callable:
    (n_sta, 3, n_t) -> (n_sta, 2, n_t) with phases (P, S)."""

    def picker(x):
        probas = sliding_window_probas(model, variables, np.asarray(x),
                                       **kwargs)
        return probas[:, :2, :]  # drop the noise class

    return picker


# ---------------------------------------------------------------------------
# SeisBench weight conversion
# ---------------------------------------------------------------------------

def convert_seisbench_weights(state_dict: Dict[str, Any], depth: int = 5):
    """Map a SeisBench torch PhaseNet ``state_dict`` (tensors or numpy) onto
    the Flax parameter tree of `PhaseNet`.

    Torch Conv1d kernels are (out, in, k) -> Flax (k, in, out); BatchNorm
    gamma/beta/mean/var map to scale/bias/mean/var.  Returns a `variables`
    dict {'params': ..., 'batch_stats': ...}.
    """
    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    sd = {k: to_np(v) for k, v in state_dict.items()}

    def conv(prefix):
        w = sd[f"{prefix}.weight"]  # (out, in, k)
        out = {"kernel": np.transpose(w, (2, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def tconv(prefix):
        w = sd[f"{prefix}.weight"]  # (in, out, k)
        out = {"kernel": np.transpose(w, (2, 0, 1))}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # SeisBench names: inc (ConvBlock), down_branch.i.{conv_same,bn1,...},
    # up_branch.i.{...}, out (final conv).  Exact names vary between
    # versions; try the canonical layout and raise with the available keys
    # otherwise so the user can adapt.
    try:
        idx = 0
        p, s = bn("in_bn")
        params[f"ConvBlock_0"] = {"Conv_0": conv("inc"), "BatchNorm_0": p}
        stats[f"ConvBlock_0"] = {"BatchNorm_0": s}
        for i in range(depth - 1):
            p, s = bn(f"down_branch.{i}.1")
            params[f"ConvBlock_{i + 1}"] = {
                "Conv_0": conv(f"down_branch.{i}.0"),
                "BatchNorm_0": p,
            }
            stats[f"ConvBlock_{i + 1}"] = {"BatchNorm_0": s}
        for j, i in enumerate(range(depth - 2, -1, -1)):
            p1, s1 = bn(f"up_branch.{j}.1")
            p2, s2 = bn(f"up_branch.{j}.3")
            params[f"UpBlock_{j}"] = {
                "ConvTranspose_0": tconv(f"up_branch.{j}.0"),
                "BatchNorm_0": p1,
                "ConvBlock_0": {
                    "Conv_0": conv(f"up_branch.{j}.2"),
                    "BatchNorm_0": p2,
                },
            }
            stats[f"UpBlock_{j}"] = {
                "BatchNorm_0": s1,
                "ConvBlock_0": {"BatchNorm_0": s2},
            }
        params["Conv_0"] = conv("out")
    except KeyError as e:
        raise KeyError(
            f"unrecognized SeisBench layout (missing {e}); available keys: "
            f"{sorted(sd.keys())[:20]}..."
        ) from e
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def gaussian_pick_labels(
    pick_samples: np.ndarray, n_samples: int, sigma: float = 10.0
) -> np.ndarray:
    """(batch, 2) P/S pick positions -> (batch, n_samples, 3) soft labels
    (P, S, noise) with Gaussian blurs around each pick."""
    t = np.arange(n_samples)[None, :]
    out = np.zeros((len(pick_samples), n_samples, 3), np.float32)
    for c in range(2):
        p = pick_samples[:, c : c + 1]
        valid = p >= 0
        g = np.exp(-0.5 * ((t - p) / sigma) ** 2) * valid
        out[:, :, c] = g
    out[:, :, 2] = np.clip(1.0 - out[:, :, 0] - out[:, :, 1], 0.0, 1.0)
    return out


def cross_entropy_loss(probas, labels, eps=1e-7):
    return -jnp.mean(jnp.sum(labels * jnp.log(probas + eps), axis=-1))


def make_train_step(model: PhaseNet, optimizer):
    """Returns a jittable train_step((params, batch_stats, opt_state),
    (x, labels)) -> (new_state, loss)."""

    def loss_fn(params, batch_stats, x, labels):
        probas, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return cross_entropy_loss(probas, labels), mutated["batch_stats"]

    def train_step(state, batch):
        params, batch_stats, opt_state = state
        x, labels = batch
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, x, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state), loss

    return train_step
