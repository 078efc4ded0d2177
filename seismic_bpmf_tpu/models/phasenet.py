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
    softmax probabilities ordered (P, S, noise) (`phases` = "PSN").
    This is the repo's *training* architecture (divisible lengths, one
    conv per stage — TPU-friendly); for porting published SeisBench
    checkpoints use `SeisBenchPhaseNet` + `convert_seisbench_weights`.
    """

    depth: int = 5
    filters_root: int = 8
    kernel: int = 7
    stride: int = 4
    n_classes: int = 3
    phases: str = "PSN"

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


class SeisBenchPhaseNet(nn.Module):
    """Flax port of SeisBench's torch PhaseNet (the "original" weights
    layout) for running published checkpoints on TPU.

    Mirrors the seisbench architecture consumed by the reference through
    the picker protocol (BPMF/dataset.py:1729-1736; the tutorial notes the
    class order is (noise, P, S), 5_backprojection.ipynb): a depth-5 1-D
    U-Net, kernel 7, stride 4, filters 8/16/32/64/128, BatchNorm eps=1e-3.
    Each down stage is a stride-1 "same" conv (+BN+relu) whose output is
    the skip, then a stride-4 conv with the stage-specific asymmetric
    padding (3,3)/(2,3)/(1,3)/(2,3) that reproduces the original
    TF-"SAME" pyramid 3001-751-188-47-12; each up stage is a VALID
    transposed conv (+BN+relu), a center-crop to the skip length (which
    exactly inverts those pads), concat [skip, x], and a "same" conv
    (+BN+relu).  Output: softmax probabilities ordered (noise, P, S).

    Weights come from `convert_seisbench_weights(torch_state_dict)`.
    """

    classes: int = 3
    phases: str = "NPS"
    kernel: int = 7
    stride: int = 4
    filters_root: int = 8
    depth: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        bn = functools.partial(
            nn.BatchNorm, use_running_average=ura, momentum=0.9,
            epsilon=1e-3,
        )
        k, s = (self.kernel,), (self.stride,)
        x = nn.Conv(self.filters_root, k, padding="SAME", name="inc")(x)
        x = nn.relu(bn(name="in_bn")(x))
        down_pads = [(3, 3), (2, 3), (1, 3), (2, 3)]
        skips = []
        for i in range(self.depth):
            f = self.filters_root * 2**i
            x = nn.Conv(f, k, padding="SAME", use_bias=False,
                        name=f"down{i}_same")(x)
            x = nn.relu(bn(name=f"down{i}_bn1")(x))
            if i < self.depth - 1:
                skips.append(x)
                x = nn.Conv(f, k, strides=s, padding=(down_pads[i],),
                            use_bias=False, name=f"down{i}_down")(x)
                x = nn.relu(bn(name=f"down{i}_bn2")(x))
        for j in range(self.depth - 1):
            f = self.filters_root * 2 ** (self.depth - 2 - j)
            x = nn.ConvTranspose(f, k, strides=s, padding="VALID",
                                 use_bias=False, name=f"up{j}_tconv")(x)
            x = nn.relu(bn(name=f"up{j}_bn1")(x))
            skip = skips[-(j + 1)]
            off = (x.shape[1] - skip.shape[1]) // 2
            x = x[:, off : off + skip.shape[1], :]
            x = jnp.concatenate([skip, x], axis=-1)
            x = nn.Conv(f, k, padding="SAME", use_bias=False,
                        name=f"up{j}_same")(x)
            x = nn.relu(bn(name=f"up{j}_bn2")(x))
        x = nn.Conv(self.classes, (1,), padding="SAME", name="out")(x)
        return nn.softmax(x, axis=-1)


def ps_channels(model) -> tuple:
    """(P, S) class indices for a picker model's output ordering."""
    phases = getattr(model, "phases", "PSN")
    return phases.index("P"), phases.index("S")


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


def make_picker(model, variables, **kwargs):
    """Build the reference-protocol picker callable:
    (n_sta, 3, n_t) -> (n_sta, 2, n_t) with phases (P, S).

    The (P, S) channels are selected from the model's declared class order
    (`phases`: "PSN" for the in-repo trainer, "NPS" for SeisBench ports).
    """
    p_idx, s_idx = ps_channels(model)

    def picker(x):
        probas = sliding_window_probas(model, variables, np.asarray(x),
                                       **kwargs)
        return probas[:, (p_idx, s_idx), :]  # drop the noise class

    return picker


# ---------------------------------------------------------------------------
# SeisBench weight conversion
# ---------------------------------------------------------------------------

def convert_seisbench_weights(state_dict: Dict[str, Any], depth: int = 5):
    """Map a SeisBench torch PhaseNet ``state_dict`` (tensors or numpy
    arrays) onto the Flax variables of `SeisBenchPhaseNet`.

    Torch layout (seisbench.models.PhaseNet): ``inc``/``in_bn``, then
    ``down_branch.{i}.[0..3]`` = (conv_same, bn1, conv_down, bn2) with the
    last stage holding only (conv_same, bn1), ``up_branch.{j}.[0..3]`` =
    (conv_up, bn1, conv_same, bn2), and ``out``.  Torch Conv1d kernels are
    (out, in, k) -> Flax (k, in, out); torch ConvTranspose1d kernels are
    (in, out, k) -> Flax (k, in, out) with the tap axis REVERSED (torch's
    transposed conv is the gradient of a conv, Flax's is a
    fractionally-strided conv — verified-equal mapping); BatchNorm
    weight/bias/running_mean/running_var map to scale/bias/mean/var.

    Returns a `variables` dict {'params': ..., 'batch_stats': ...} for
    ``SeisBenchPhaseNet().apply``.  Reference picker protocol:
    BPMF/dataset.py:1729-1736.
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
        out = {"kernel": np.ascontiguousarray(
            np.transpose(w, (2, 0, 1))[::-1]
        )}
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
    try:
        params["inc"] = conv("inc")
        params["in_bn"], stats["in_bn"] = bn("in_bn")
        for i in range(depth):
            params[f"down{i}_same"] = conv(f"down_branch.{i}.0")
            params[f"down{i}_bn1"], stats[f"down{i}_bn1"] = bn(
                f"down_branch.{i}.1"
            )
            if i < depth - 1:
                params[f"down{i}_down"] = conv(f"down_branch.{i}.2")
                params[f"down{i}_bn2"], stats[f"down{i}_bn2"] = bn(
                    f"down_branch.{i}.3"
                )
        for j in range(depth - 1):
            params[f"up{j}_tconv"] = tconv(f"up_branch.{j}.0")
            params[f"up{j}_bn1"], stats[f"up{j}_bn1"] = bn(
                f"up_branch.{j}.1"
            )
            params[f"up{j}_same"] = conv(f"up_branch.{j}.2")
            params[f"up{j}_bn2"], stats[f"up{j}_bn2"] = bn(
                f"up_branch.{j}.3"
            )
        params["out"] = conv("out")
    except KeyError as e:
        raise KeyError(
            f"unrecognized SeisBench layout (missing {e}); available keys: "
            f"{sorted(sd.keys())[:20]}..."
        ) from e
    return {"params": params, "batch_stats": stats}


def load_seisbench_checkpoint(path: str):
    """One-command SeisBench checkpoint port: torch ``.pt``/``.pth``
    state_dict file (or ``.npz`` of numpy arrays) -> (model, variables)
    ready for `make_picker` / `phasenet_probas_device`.
    """
    if str(path).endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    model = SeisBenchPhaseNet()
    return model, convert_seisbench_weights(sd, depth=model.depth)


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
