"""PhaseNet training pipeline.

The reference consumes a pretrained SeisBench picker; this module adds what
the reference cannot do natively — (re)training the picker on the user's own
region, on device, with data-parallel sharding over a mesh:

  windows_from_events : picked Events -> (windows, pick labels)
  train_phasenet      : optax training loop (optionally mesh-sharded)

Labels follow the PhaseNet convention: Gaussian blurs at the P/S picks plus
a noise class.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .phasenet import (
    PhaseNet,
    WINDOW,
    gaussian_pick_labels,
    make_train_step,
)


def windows_from_events(
    events,
    window: int = WINDOW,
    target_sr: float = 100.0,
    component_order: str = "ZNE",
    jitter_sec: float = 5.0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (x (n, window, 3), picks (n, 2)) training pairs from picked
    events (each event yields one randomly-jittered window).

    Events must have `picks` (P_picks/S_picks in native samples) and
    waveforms read with time_shifted=False.
    """
    from scipy.signal import resample_poly

    rng = rng or np.random.default_rng(0)
    xs, ps = [], []
    for ev in events:
        if not hasattr(ev, "picks") or not hasattr(ev, "traces"):
            continue
        arr = ev.waveforms_arr  # (n_sta, n_comp, n)
        comp_idx = {c: i for i, c in enumerate(ev.components)}
        order = [comp_idx[c] for c in component_order if c in comp_idx]
        arr = arr[:, order, :]
        sr = ev.sr
        if sr != target_sr:
            up, down = int(round(target_sr)), int(round(sr))
            arr = resample_poly(arr, up, down, axis=-1)
        scale = target_sr / sr
        for s, sta in enumerate(ev.stations):
            if sta not in ev.picks.index:
                continue
            p_pick = ev.picks.loc[sta].get("P_picks", np.nan)
            s_pick = ev.picks.loc[sta].get("S_picks", np.nan)
            if np.isnan(p_pick) and np.isnan(s_pick):
                continue
            anchor = np.nanmin([p_pick, s_pick]) * scale
            jitter = rng.uniform(-jitter_sec, jitter_sec) * target_sr
            start = int(np.clip(anchor - window // 3 + jitter, 0,
                                max(0, arr.shape[-1] - window)))
            win = arr[s, :, start : start + window]
            if win.shape[-1] < window:
                win = np.pad(win, ((0, 0), (0, window - win.shape[-1])))
            # normalize per channel
            std = win.std(axis=-1, keepdims=True)
            std[std == 0] = 1.0
            win = (win - win.mean(axis=-1, keepdims=True)) / std
            picks = np.array(
                [
                    p_pick * scale - start if not np.isnan(p_pick) else -1e9,
                    s_pick * scale - start if not np.isnan(s_pick) else -1e9,
                ]
            )
            xs.append(win.T)  # (window, 3)
            ps.append(picks)
    if not xs:
        return (np.zeros((0, window, 3), np.float32),
                np.zeros((0, 2), np.float32))
    return (np.stack(xs).astype(np.float32),
            np.stack(ps).astype(np.float32))


def train_phasenet(
    x: np.ndarray,
    picks: np.ndarray,
    n_epochs: int = 10,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    sigma: float = 10.0,
    model: Optional[PhaseNet] = None,
    variables=None,
    mesh=None,
    seed: int = 0,
    verbose: bool = True,
):
    """Supervised PhaseNet training; batch axis sharded over `mesh` if given.

    Returns (model, variables, loss_history).
    """
    import jax
    import jax.numpy as jnp
    import optax

    window = x.shape[1]
    if model is None:
        model = PhaseNet()
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, window, 3)), train=False
        )
    labels = gaussian_pick_labels(picks, window, sigma=sigma)

    optimizer = optax.adam(learning_rate)
    params = variables["params"]
    opt_state = optimizer.init(params)
    state = (params, variables["batch_stats"], opt_state)
    step = jax.jit(make_train_step(model, optimizer))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P(mesh.axis_names))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        # batch must divide the mesh size
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        batch_size = max(batch_size // n_dev * n_dev, n_dev)
    rng = np.random.default_rng(seed)
    n = len(x)
    losses = []
    for epoch in range(n_epochs):
        order = rng.permutation(n)
        epoch_loss = []
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            xb = jnp.asarray(x[idx])
            yb = jnp.asarray(labels[idx])
            if mesh is not None:
                xb = jax.device_put(xb, data_sharding)
                yb = jax.device_put(yb, data_sharding)
            state, loss = step(state, (xb, yb))
            epoch_loss.append(float(loss))
        losses.append(float(np.mean(epoch_loss)) if epoch_loss else np.nan)
        if verbose:
            print(f"epoch {epoch}: loss {losses[-1]:.4f}")
    params, batch_stats, _ = state
    return model, {"params": params, "batch_stats": batch_stats}, losses
