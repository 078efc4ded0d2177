"""TPU-native normalized cross-correlation (matched filter).

Replaces the external `fast_matched_filter` C/CUDA package consumed by the
reference at BPMF/similarity_search.py:526-533 (network-summed scan) and
BPMF/dataset.py:4818-4830 (per-channel inter-template CC).

Design (TPU-first, not a port):
  - The sliding dot products are expressed as a grouped 1-D convolution so
    XLA lowers them onto the MXU (one group per data channel, `n_templates`
    filters per group).
  - Window normalization statistics (sum, sum of squares over each length-L
    window) come from `lax.reduce_window`, fused by XLA with the surrounding
    elementwise ops.
  - Per-(template, channel) integer moveouts are applied by *gathering the
    correlation series at shifted lags* rather than shifting the data; the
    gather is a cheap VPU op compared to the MXU correlation.
  - The lag axis is processed in fixed-size blocks so the per-channel
    correlation series is never materialized at full length (the reference
    bounds memory by template-axis chunking instead,
    BPMF/similarity_search.py:773-807).

Semantics match `ops.reference.matched_filter`: Pearson CC per channel,
zero-variance or out-of-bounds windows give CC = 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _channel_correlations(templates_dm, data, n_valid):
    """Raw correlations of demeaned templates against data at every lag.

    templates_dm : (n_tp, n_ch, L) demeaned templates
    data : (n_ch, n_samp)
    returns corr : (n_tp, n_ch, n_valid) with
        corr[t, c, u] = sum_i templates_dm[t, c, i] * data[c, u + i]
    """
    n_tp, n_ch, L = templates_dm.shape
    # grouped conv: group g (= channel) has its own n_tp filters
    lhs = data[None, :, :]  # (1, n_ch, n_samp)
    # rhs layout (out_features, in_features_per_group=1, L); out feature
    # g * n_tp + t must use group g -> transpose to (n_ch, n_tp, L) first
    rhs = jnp.transpose(templates_dm, (1, 0, 2)).reshape(n_tp * n_ch, 1, L)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=n_ch,
        preferred_element_type=jnp.float32,
    )  # (1, n_ch * n_tp, n_valid)
    out = out[0].reshape(n_ch, n_tp, -1)[:, :, :n_valid]
    return jnp.transpose(out, (1, 0, 2))


def _window_stats(data, L):
    """Sliding sum and sum-of-squares over windows of length L.

    data : (n_ch, n_samp) -> (n_ch, n_samp - L + 1) each
    """

    def wsum(x):
        return jax.lax.reduce_window(
            x,
            jnp.float32(0.0),
            jax.lax.add,
            window_dimensions=(1, L),
            window_strides=(1, 1),
            padding="VALID",
        )

    return wsum(data), wsum(data * data)


@functools.partial(
    jax.jit,
    static_argnames=("step", "network_sum", "n_corr_block", "n_samp", "pad_left"),
)
def _mf_block(
    templates,
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
    n_tp, n_ch, L = templates.shape
    block_ext = data_block.shape[-1]
    n_valid = block_ext - L + 1

    x = templates - jnp.mean(templates, axis=-1, keepdims=True)
    x_norm = jnp.sqrt(jnp.sum(x * x, axis=-1))  # (n_tp, n_ch)

    corr = _channel_correlations(x, data_block, n_valid)
    wsum, wsumsq = _window_stats(data_block, L)  # (n_ch, n_valid)
    # variance * L of each window, guarded against negative round-off
    var_l = jnp.maximum(wsumsq - wsum * wsum / L, 0.0)
    y_norm = jnp.sqrt(var_l)  # (n_ch, n_valid)

    # local window position of correlation k (k in [0, n_corr_block)):
    #   u = k * step + (moveouts + pad_left)
    k = jnp.arange(n_corr_block, dtype=jnp.int32)
    u = k[None, None, :] * step + (moveouts[:, :, None] + pad_left)
    u_safe = jnp.clip(u, 0, n_valid - 1)
    # absolute (unpadded) start of the window
    a = block_start + u - pad_left
    in_bounds = (a >= 0) & (a + L <= n_samp) & (u >= 0) & (u < n_valid)

    cc_raw = jnp.take_along_axis(corr, u_safe, axis=-1)  # (n_tp, n_ch, K)
    y_norm_g = jnp.take_along_axis(
        jnp.broadcast_to(y_norm[None], (n_tp, n_ch, n_valid)), u_safe, axis=-1
    )
    denom = x_norm[:, :, None] * y_norm_g
    valid = in_bounds & (denom > 0.0)
    cc = jnp.where(valid, cc_raw / jnp.where(valid, denom, 1.0), 0.0)

    if network_sum:
        return jnp.einsum("tck,tc->tk", cc, weights, precision="highest")
    return jnp.transpose(cc, (0, 2, 1))


def matched_filter(
    templates,
    moveouts,
    weights,
    data,
    step: int = 1,
    network_sum: bool = True,
    n_corr_block: int = 65536,
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
    templates = jnp.asarray(templates, jnp.float32)
    data = jnp.asarray(data, jnp.float32)
    moveouts = jnp.asarray(moveouts, jnp.int32)
    weights = jnp.asarray(weights, jnp.float32)

    n_tp, n_sta, n_comp, L = templates.shape
    n_samp = data.shape[-1]
    n_ch = n_sta * n_comp
    n_corr = (n_samp - L) // step + 1

    tp_flat = templates.reshape(n_tp, n_ch, L)
    mv_flat = moveouts.reshape(n_tp, n_ch)
    w_flat = weights.reshape(n_tp, n_ch)
    data_flat = data.reshape(n_ch, n_samp)

    max_mv = int(np.max(np.asarray(mv_flat))) if mv_flat.size else 0
    min_mv = min(0, int(np.min(np.asarray(mv_flat))) if mv_flat.size else 0)
    pad_left = -min_mv

    K = min(n_corr_block, n_corr)
    n_blocks = math.ceil(n_corr / K)
    # block slice must cover local positions [0, (K-1)*step + max_mv+pad_left + L)
    block_ext = (K - 1) * step + max_mv + pad_left + L
    pad_right = max(0, (n_blocks - 1) * K * step + block_ext - (n_samp + pad_left))
    data_pad = jnp.pad(data_flat, ((0, 0), (pad_left, pad_right)))

    outs = []
    for b in range(n_blocks):
        start = b * K * step
        data_block = jax.lax.dynamic_slice(
            data_pad, (0, start), (n_ch, block_ext)
        )
        out_b = _mf_block(
            tp_flat,
            mv_flat,
            w_flat,
            data_block,
            start,
            step=step,
            network_sum=network_sum,
            n_corr_block=K,
            n_samp=n_samp,
            pad_left=pad_left,
        )
        outs.append(out_b)
    out = jnp.concatenate(outs, axis=1)[:, :n_corr]
    if not network_sum:
        return out.reshape(n_tp, n_corr, n_sta, n_comp)
    return out
