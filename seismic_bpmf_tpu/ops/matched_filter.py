"""TPU-native normalized cross-correlation (matched filter).

Replaces the external `fast_matched_filter` C/CUDA package consumed by the
reference at BPMF/similarity_search.py:526-533 (network-summed scan) and
BPMF/dataset.py:4818-4830 (per-channel inter-template CC).

Design (TPU-first, not a port).  The sliding correlation is formulated as a
**banded matrix multiplication** so it runs on the MXU with no gathers and no
XLA convolutions (grouped 1-D convs lower to ~4 GMAC/s scalar code on TPU;
gathers are similarly pathological — both were measured and rejected):

  1. The data is reshaped (zero-copy) into overlapping chunks of length 2L
     with stride L:  E[c, m, i] = d[c, m*L + i].  Every length-L window at
     lag u = m*L + r (r < L) lies inside chunk m.
  2. Each demeaned template is expanded host-side into a banded Toeplitz
     matrix W[t, c, r, i] = tpl[t, c, i - r] (zeros outside the band), so
         corr[t, c, m*L + r] = sum_i W[t, c, r, i] * E[c, m, i]
     is a batched matmul `einsum('tcri,cmi->tcmr')`.  The bandwidth-heavy
     side (continuous data) is only reshaped; the 2L× amplification happens
     on the small template side.
  3. Window normalization sums (s1, s2 over each length-L window) use the
     same banded matmul with a shared ones-band.
  4. The per-(template, channel) integer moveout shift, channel weighting,
     network sum and `step` decimation are fused into one convolution with
     one-hot filters (batch_group_count = n_tp, window_stride = step).
  5. The lag axis is processed in fixed-size blocks so per-channel series
     are never materialized at full length (the reference bounds memory by
     template-axis chunking instead, BPMF/similarity_search.py:773-807).

Semantics match `ops.reference.matched_filter`: Pearson CC per channel,
zero-variance or out-of-bounds windows give CC = 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def _build_band(templates_dm: np.ndarray) -> np.ndarray:
    """Banded Toeplitz expansion of demeaned templates (host side).

    templates_dm : (n_tp, n_ch, L) -> W (n_tp, n_ch, L, 2L) with
    W[..., r, i] = templates_dm[..., i - r] for 0 <= i - r < L else 0.
    """
    n_tp, n_ch, L = templates_dm.shape
    padded = np.zeros((n_tp, n_ch, 3 * L), np.float32)
    padded[:, :, L : 2 * L] = templates_dm
    # row r = padded[L - r : 3L - r]
    w = np.lib.stride_tricks.sliding_window_view(padded, 2 * L, axis=-1)
    # w[..., s, :] = padded[..., s : s + 2L]; row r -> s = L - r
    rows = (L - np.arange(L))[::-1]  # ascending s for r = L-1 .. 0
    w = w[:, :, rows][:, :, ::-1]
    return np.ascontiguousarray(w, dtype=np.float32)


def _ones_band(L: int) -> np.ndarray:
    """Shared ones-band (L, 2L): B[r, i] = 1 for 0 <= i - r < L."""
    r = np.arange(L)[:, None]
    i = np.arange(2 * L)[None, :]
    return ((i - r >= 0) & (i - r < L)).astype(np.float32)


def _chunk2(data, L, n_m):
    """E[c, m, i] = data[c, m*L + i] for i < 2L (reshape + concat only)."""
    n_ch = data.shape[0]
    need = (n_m + 1) * L
    if data.shape[-1] < need:
        data = jnp.pad(data, ((0, 0), (0, need - data.shape[-1])))
    data = data[:, :need]
    chunks = data.reshape(n_ch, n_m + 1, L)
    return jnp.concatenate([chunks[:, :-1], chunks[:, 1:]], axis=-1)


def _corr_and_stats(band, ones_band, data, n_valid):
    """Raw correlations + window stats via banded matmuls.

    band : (n_tp, n_ch, L, 2L);  data : (n_ch, ext) with
    ext >= (ceil(n_valid / L) + 1) * L.
    Returns (corr (n_tp, n_ch, n_valid), s1 (n_ch, n_valid), s2).
    """
    n_tp, n_ch, L, _ = band.shape
    n_m = math.ceil(n_valid / L)
    E = _chunk2(data, L, n_m)  # (n_ch, n_m, 2L)
    corr = jnp.einsum("tcri,cmi->tcmr", band, E, precision=_HI)
    corr = corr.reshape(n_tp, n_ch, n_m * L)[:, :, :n_valid]
    s1 = jnp.einsum("ri,cmi->cmr", ones_band, E, precision=_HI)
    s2 = jnp.einsum("ri,cmi->cmr", ones_band, E * E, precision=_HI)
    s1 = s1.reshape(n_ch, n_m * L)[:, :n_valid]
    s2 = s2.reshape(n_ch, n_m * L)[:, :n_valid]
    return corr, s1, s2


def _onehot_shift_sum(ccn, mv_shift, weights, M, step, K):
    """Fused moveout-shift + weighted channel sum + step decimation.

    ccn : (n_tp, n_ch, n_valid) normalized per-channel CCs
    mv_shift : (n_tp, n_ch) non-negative shift indices < M
    Returns (n_tp, K): out[t, k] = sum_ch w[t,ch] * ccn[t, ch, k*step + mv].
    """
    n_tp, n_ch, n_valid = ccn.shape
    m_idx = jnp.arange(M, dtype=jnp.int32)
    onehot = (mv_shift[:, :, None] == m_idx[None, None, :]).astype(ccn.dtype)
    rhs = onehot * weights[:, :, None]  # (n_tp, n_ch, M)
    out = jax.lax.conv_general_dilated(
        ccn,  # (batch = n_tp, features = n_ch, n_valid)
        rhs,
        window_strides=(step,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        batch_group_count=n_tp,
        precision=_HI,
        preferred_element_type=jnp.float32,
    )
    # out : (1, n_tp, n_out); n_out = (n_valid - M) // step + 1 >= K
    return out[0, :, :K]


def _onehot_shift_per_channel(ccn, mv_shift, M, step, K):
    """Per-channel moveout shift (network_sum=False path).

    Returns (n_tp, n_ch, K): out[t,c,k] = ccn[t, c, k*step + mv[t,c]].
    """
    n_tp, n_ch, n_valid = ccn.shape
    m_idx = jnp.arange(M, dtype=jnp.int32)
    onehot = (mv_shift[:, :, None] == m_idx[None, None, :]).astype(ccn.dtype)
    out = jax.lax.conv_general_dilated(
        ccn.reshape(1, n_tp * n_ch, n_valid),
        onehot.reshape(n_tp * n_ch, 1, M),
        window_strides=(step,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=n_tp * n_ch,
        precision=_HI,
        preferred_element_type=jnp.float32,
    )
    return out[0].reshape(n_tp, n_ch, -1)[:, :, :K]


@functools.partial(
    jax.jit,
    static_argnames=("step", "network_sum", "n_corr_block", "n_samp",
                     "pad_left", "L"),
)
def _mf_block(
    band,
    x_norm,
    ones_band,
    moveouts,
    weights,
    data_block,
    block_start,
    *,
    step: int,
    network_sum: bool,
    n_corr_block: int,
    n_samp: int,
    pad_left: int,
    L: int,
):
    """Matched filter for one block of `n_corr_block` correlation lags.

    data_block : (n_ch, block_ext) slice of the zero-padded data beginning at
        padded sample index `block_start` (traced scalar).  The absolute
        (unpadded) sample index of local window position `u` is
        ``block_start + u - pad_left``; windows whose absolute span leaves
        ``[0, n_samp)`` are masked to CC = 0.
    Returns (n_tp, n_corr_block) if network_sum else
        (n_tp, n_corr_block, n_ch).
    """
    n_tp, n_ch = x_norm.shape
    block_ext = data_block.shape[-1]
    n_valid = block_ext - L + 1
    K = n_corr_block

    corr, s1, s2 = _corr_and_stats(band, ones_band, data_block, n_valid)
    var_l = jnp.maximum(s2 - s1 * s1 / L, 0.0)
    y_norm = jnp.sqrt(var_l)  # (n_ch, n_valid)

    # normalized per-channel CC at every local window position u; windows
    # whose absolute span leaves [0, n_samp) are zeroed (the mask depends on
    # u only: a = block_start + u - pad_left)
    a = block_start + jnp.arange(n_valid, dtype=jnp.int32) - pad_left
    u_ok = (a >= 0) & (a + L <= n_samp)  # (n_valid,)
    denom = x_norm[:, :, None] * y_norm[None, :, :]
    valid = u_ok[None, None, :] & (denom > 0.0)
    ccn = jnp.where(valid, corr / jnp.where(valid, denom, 1.0), 0.0)

    # fused shift/weight/sum: filter taps cover shifts [0, M)
    mv_shift = moveouts + pad_left  # >= 0
    M = n_valid - (K - 1) * step  # by construction > max(mv_shift)
    if network_sum:
        return _onehot_shift_sum(ccn, mv_shift, weights, M, step, K)
    out = _onehot_shift_per_channel(ccn, mv_shift, M, step, K)
    return jnp.transpose(out, (0, 2, 1))


def matched_filter(
    templates,
    moveouts,
    weights,
    data,
    step: int = 1,
    network_sum: bool = True,
    n_corr_block: int = 262144,
):
    """Normalized CC of a template bank against continuous data.

    Parameters mirror `ops.reference.matched_filter`:
      templates : (n_tp, n_sta, n_comp, L) float32
      moveouts : (n_tp, n_sta, n_comp) int32, samples
      weights : (n_tp, n_sta, n_comp) float32
      data : (n_sta, n_comp, n_samp) float32
      step : lag decimation in samples
      network_sum : sum channels with `weights` if True
      n_corr_block : lags per device block (memory knob; result-invariant)

    Returns
    -------
    (n_tp, n_corr) float32 if network_sum, else (n_tp, n_corr, n_sta, n_comp);
    n_corr = (n_samp - L) // step + 1.
    """
    templates = np.asarray(templates, np.float32)
    data = jnp.asarray(data, jnp.float32)
    moveouts_np = np.asarray(moveouts, np.int32)
    weights = jnp.asarray(weights, jnp.float32)

    n_tp, n_sta, n_comp, L = templates.shape
    n_samp = data.shape[-1]
    n_ch = n_sta * n_comp
    n_corr = (n_samp - L) // step + 1

    tp_flat = templates.reshape(n_tp, n_ch, L)
    tp_dm = tp_flat - tp_flat.mean(axis=-1, keepdims=True)
    band = jnp.asarray(_build_band(tp_dm))
    x_norm = jnp.asarray(np.sqrt((tp_dm.astype(np.float64) ** 2).sum(-1)),
                         jnp.float32)
    ones_band = jnp.asarray(_ones_band(L))
    mv_flat = jnp.asarray(moveouts_np.reshape(n_tp, n_ch))
    w_flat = weights.reshape(n_tp, n_ch)
    data_flat = data.reshape(n_ch, n_samp)

    max_mv = int(moveouts_np.max()) if moveouts_np.size else 0
    min_mv = min(0, int(moveouts_np.min()) if moveouts_np.size else 0)
    pad_left = -min_mv

    K = min(n_corr_block, n_corr)
    n_blocks = math.ceil(n_corr / K)
    # block slice must cover local positions [0, (K-1)*step + max_mv+pad_left + L)
    block_ext = (K - 1) * step + max_mv + pad_left + L
    # round up so the 2L-chunking in _corr_and_stats has full chunks
    n_m = math.ceil((block_ext - L + 1) / L)
    block_ext = (n_m + 1) * L
    pad_right = max(0, (n_blocks - 1) * K * step + block_ext - (n_samp + pad_left))
    data_pad = jnp.pad(data_flat, ((0, 0), (pad_left, pad_right)))

    outs = []
    for b in range(n_blocks):
        start = b * K * step
        data_block = jax.lax.dynamic_slice(
            data_pad, (0, start), (n_ch, block_ext)
        )
        out_b = _mf_block(
            band,
            x_norm,
            ones_band,
            mv_flat,
            w_flat,
            data_block,
            start,
            step=step,
            network_sum=network_sum,
            n_corr_block=K,
            n_samp=n_samp,
            pad_left=pad_left,
            L=L,
        )
        outs.append(out_b)
    out = jnp.concatenate(outs, axis=1)[:, :n_corr]
    if not network_sum:
        return out.reshape(n_tp, n_corr, n_sta, n_comp)
    return out
