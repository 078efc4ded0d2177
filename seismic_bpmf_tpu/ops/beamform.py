"""TPU-native shift-and-stack beamforming (backprojection).

Replaces the external `beampower` C/CUDA package consumed by the reference at
BPMF/template_search.py:549-569.

    beam[i, t] = sum_{s,c,p} w_src[i, s] * w_ph[s, c, p] * feat[s, c, t + mv[i, s, p]]

Design (TPU-first, not a port of the CUDA gather loop):
  1. The component axis is folded first with an einsum (MXU):
         g[s, p, t] = sum_c w_ph[s, c, p] * feat[s, c, t]
  2. The per-(source, station, phase) integer time shifts are then applied by
     one of two engines:
       - ``engine='onehot'``: for each time block, extract the Hankel matrix
         of time-shifted windows H[sp, m, b] = g[sp, t0 + m + b] (an im2col
         via `conv_general_dilated_patches`), then compute
         beam = W @ H as a dense matmul on the MXU, where
         W[i, (sp, m)] = w_src[i, s] * onehot(mv[i, sp] == m).  This turns a
         gather-bound problem into a matmul-bound one — the idiomatic TPU
         formulation.  W is built on the fly per source block (VPU compare),
         so HBM never holds the full one-hot matrix.
       - ``engine='gather'``: per-source dynamic slices (vmapped), a simple
         fallback used for small grids and as a cross-check.
  3. The max/argmax over the (optionally sharded) source axis is a running
     (value, index) reduction with first-max tie-breaking, matching the
     reference's `np.argmax` semantics.

Out-of-bounds policies (`beampower` semantics, BPMF/template_search.py:529-537):
  - 'flexible': out-of-range samples contribute 0 (zero padding).
  - 'strict': beam[i, t] = 0 wherever any used channel points out of range.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def fold_components(features, weights_phases):
    """g[s, p, t] = sum_c w_ph[s, c, p] * feat[s, c, t], flattened to (s*p, t)."""
    g = jnp.einsum(
        "scp,sct->spt",
        jnp.asarray(weights_phases, jnp.float32),
        jnp.asarray(features, jnp.float32),
        precision="highest",
    )
    n_sta, n_ph, n_samp = g.shape
    return g.reshape(n_sta * n_ph, n_samp)


def _flatten_moveouts(moveouts, weights_phases, weights_sources):
    """Flatten (sta, phase) axes; returns mv (n_src, n_sp), w (n_src, n_sp),
    and per-source used-channel moveout bounds for the 'strict' policy."""
    mv = np.asarray(moveouts)
    n_src, n_sta, n_ph = mv.shape
    mv_flat = mv.reshape(n_src, n_sta * n_ph).astype(np.int32)
    phase_used = np.any(np.asarray(weights_phases) != 0.0, axis=1)  # (sta, ph)
    w_src = np.asarray(weights_sources, dtype=np.float32)
    w_flat = np.repeat(w_src, n_ph, axis=1) * phase_used.reshape(-1)[None, :]
    used = w_flat != 0.0
    big = np.int32(2**30)
    mv_used_max = np.where(used, mv_flat, -big).max(axis=1)
    mv_used_min = np.where(used, mv_flat, big).min(axis=1)
    no_used = ~used.any(axis=1)
    mv_used_max[no_used] = 0
    mv_used_min[no_used] = 0
    return mv_flat, w_flat, mv_used_min, mv_used_max


def _strict_mask(beam, t_abs, lo_s, hi_s, n_samp):
    ok = (t_abs[None, :] + lo_s[:, None] >= 0) & (
        t_abs[None, :] + hi_s[:, None] < n_samp
    )
    return jnp.where(ok, beam, 0.0)


def _reduce_scan(one_block, blocks, src_block, src_ofs, n_src_total, B, reduce):
    """Run `one_block` over stacked source blocks, reducing max/argmax or
    concatenating the full beam.

    `src_ofs` (traced) is the global index of the first local source (non-zero
    when the source axis is sharded over a mesh); padded fake sources (global
    index >= n_src_total) are excluded from the argmax via a -inf mask.
    Returned argmax indices are global.
    """
    if reduce == "none":
        beams = jax.lax.map(one_block, blocks)
        return beams.reshape(-1, B)

    row = jnp.arange(src_block, dtype=jnp.int32)

    def scan_body(carry, args):
        best_val, best_src, blk = carry
        beam = one_block(args)
        src_ids = src_ofs + blk * src_block + row
        beam_m = jnp.where((src_ids < n_src_total)[:, None], beam, -jnp.inf)
        loc = jnp.argmax(beam_m, axis=0)
        val = beam_m[loc, jnp.arange(B)]
        take = val > best_val
        best_val = jnp.where(take, val, best_val)
        best_src = jnp.where(
            take, src_ofs + blk * src_block + loc.astype(jnp.int32), best_src
        )
        return (best_val, best_src, blk + 1), None

    init = (
        jnp.full((B,), -jnp.inf, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.int32(0),
    )
    (best_val, best_src, _), _ = jax.lax.scan(scan_body, init, blocks)
    return best_val, best_src


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "M", "n_samp", "win_off", "strict", "reduce", "src_block",
    ),
)
def _bp_time_block_onehot(
    g_pad, mv, w, mv_used_min, mv_used_max, t0, t_base, src_ofs, n_src,
    *, B, M, n_samp, win_off, strict, reduce, src_block,
):
    """One time block of the one-hot-matmul beamformer (MXU path).

    `t0` is the local slice start inside g_pad; `t_base` is the absolute
    output time of the block's first sample (differs from t0 when the time
    axis is sharded); `mv` holds the one-hot shift indices
    ``moveout - min_moveout`` in [0, M); `win_off` is the static offset
    ``min_moveout + pad_left`` of the Hankel window inside g_pad.
    """
    n_sp = g_pad.shape[0]
    n_sblk = mv.shape[0] // src_block
    # Hankel of shifted windows: H[sp, m, b] = g_pad[sp, t0 + win_off + m + b]
    window = jax.lax.dynamic_slice(g_pad, (0, t0 + win_off), (n_sp, M + B - 1))
    patches = jax.lax.conv_general_dilated_patches(
        window[:, None, :],  # (n_sp, 1, M+B-1)
        filter_shape=(M,),
        window_strides=(1,),
        padding="VALID",
        precision=jax.lax.Precision.HIGHEST,
    )  # (n_sp, M, B)
    H = patches.reshape(n_sp * M, B)
    t_abs = t_base + jnp.arange(B, dtype=jnp.int32)
    m_idx = jnp.arange(M, dtype=jnp.int32)

    blocks = (
        mv.reshape(n_sblk, src_block, n_sp),
        w.reshape(n_sblk, src_block, n_sp),
        mv_used_min.reshape(n_sblk, src_block),
        mv_used_max.reshape(n_sblk, src_block),
    )

    def one_block(args):
        mv_s, w_s, lo_s, hi_s = args
        onehot = (mv_s[:, :, None] == m_idx[None, None, :]).astype(jnp.float32)
        w_onehot = (onehot * w_s[:, :, None]).reshape(src_block, n_sp * M)
        beam = jnp.dot(
            w_onehot, H,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if strict:
            beam = _strict_mask(beam, t_abs, lo_s, hi_s, n_samp)
        return beam

    return _reduce_scan(
        one_block, blocks, src_block, src_ofs, n_src, B, reduce
    )


@functools.partial(
    jax.jit,
    static_argnames=("B", "n_samp", "strict", "reduce", "src_block"),
)
def _bp_time_block_gather(
    g_pad, mv, w, mv_used_min, mv_used_max, t0, t_base, src_ofs, n_src,
    *, B, n_samp, strict, reduce, src_block,
):
    """One time block of the gather-engine beamformer.

    `t0` is the local slice start inside g_pad (mv pre-offset by pad_left so
    g_pad[t0 + mv + b] = g[t0 + b + moveout]); `t_base` is the absolute
    output time of the block's first sample.
    """
    n_sp = g_pad.shape[0]
    n_sblk = mv.shape[0] // src_block
    t_abs = t_base + jnp.arange(B, dtype=jnp.int32)

    blocks = (
        mv.reshape(n_sblk, src_block, n_sp),
        w.reshape(n_sblk, src_block, n_sp),
        mv_used_min.reshape(n_sblk, src_block),
        mv_used_max.reshape(n_sblk, src_block),
    )

    def one_block(args):
        mv_s, w_s, lo_s, hi_s = args

        def one_source(mv_i, w_i):
            def one_sp(acc, sp_inputs):
                mv_sp, w_sp, g_sp = sp_inputs
                vals = jax.lax.dynamic_slice(g_sp, (t0 + mv_sp,), (B,))
                return acc + w_sp * vals, None

            acc0 = jnp.zeros((B,), jnp.float32)
            acc, _ = jax.lax.scan(one_sp, acc0, (mv_i, w_i, g_pad))
            return acc

        beam = jax.vmap(one_source)(mv_s, w_s)  # (src_block, B)
        if strict:
            beam = _strict_mask(beam, t_abs, lo_s, hi_s, n_samp)
        return beam

    return _reduce_scan(
        one_block, blocks, src_block, src_ofs, n_src, B, reduce
    )


def beamform(
    features,
    moveouts,
    weights_phases,
    weights_sources,
    reduce: str = "max",
    out_of_bounds: str = "strict",
    engine: str = "onehot",
    time_block: int = 16384,
    src_block: int = 512,
):
    """Beamform waveform features over a grid of candidate sources.

    Parameters mirror `ops.reference.beamform` (and the `beampower` call at
    BPMF/template_search.py:549-569):
      features : (n_sta, n_comp, n_samp) float32
      moveouts : (n_src, n_sta, n_ph) int, samples
      weights_phases : (n_sta, n_comp, n_ph) float32
      weights_sources : (n_src, n_sta) float32
      reduce : 'max' -> (maxbeam (n_samp,), maxbeam_sources (n_samp,) int32);
               'none' -> beam (n_src, n_samp)
      out_of_bounds : 'strict' | 'flexible'
      engine : 'onehot' (MXU matmul formulation) | 'gather'
      time_block, src_block : device blocking knobs (result-invariant)
    """
    assert reduce in ("max", "none")
    assert out_of_bounds in ("strict", "flexible")
    features = jnp.asarray(features, jnp.float32)
    n_sta, n_comp, n_samp = features.shape
    mv_flat, w_flat, mv_lo, mv_hi = _flatten_moveouts(
        moveouts, weights_phases, weights_sources
    )
    n_src, n_sp = mv_flat.shape
    strict = out_of_bounds == "strict"

    g = fold_components(features, weights_phases)  # (n_sp, n_samp)

    min_mv = int(mv_flat.min()) if mv_flat.size else 0
    max_mv = int(mv_flat.max()) if mv_flat.size else 0
    pad_left = max(0, -min_mv)

    B = min(time_block, n_samp)
    n_blocks = math.ceil(n_samp / B)
    src_block = min(src_block, n_src)

    # pad the source axis to a multiple of src_block (fake sources are
    # excluded from the reduction by the n_src mask in _reduce_scan)
    pad_src = (-n_src) % src_block
    if pad_src:
        mv_flat = np.pad(mv_flat, ((0, pad_src), (0, 0)))
        w_flat = np.pad(w_flat, ((0, pad_src), (0, 0)))
        mv_lo = np.pad(mv_lo, (0, pad_src))
        mv_hi = np.pad(mv_hi, (0, pad_src))

    if engine == "onehot":
        M = max_mv - min_mv + 1
        win_off = min_mv + pad_left  # = max(0, min_mv) >= 0
        pad_right = max(
            0,
            (n_blocks - 1) * B + win_off + M + B - 1 - (n_samp + pad_left),
        )
        g_pad = jnp.pad(g, ((0, 0), (pad_left, pad_right)))
        run = lambda t0: _bp_time_block_onehot(
            g_pad, jnp.asarray(mv_flat - min_mv), jnp.asarray(w_flat),
            jnp.asarray(mv_lo), jnp.asarray(mv_hi),
            t0, t0, jnp.int32(0), jnp.int32(n_src),
            B=B, M=M, n_samp=n_samp, win_off=win_off,
            strict=strict, reduce=reduce, src_block=src_block,
        )
    elif engine == "gather":
        pad_right = max(0, (n_blocks - 1) * B + max_mv + B - n_samp)
        g_pad = jnp.pad(g, ((0, 0), (pad_left, pad_right)))
        run = lambda t0: _bp_time_block_gather(
            g_pad, jnp.asarray(mv_flat + pad_left), jnp.asarray(w_flat),
            jnp.asarray(mv_lo), jnp.asarray(mv_hi),
            t0, t0, jnp.int32(0), jnp.int32(n_src),
            B=B, n_samp=n_samp,
            strict=strict, reduce=reduce, src_block=src_block,
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")

    if reduce == "max":
        max_parts, src_parts = [], []
        for b in range(n_blocks):
            mb, sb = run(b * B)
            max_parts.append(mb)
            src_parts.append(sb)
        return (
            jnp.concatenate(max_parts)[:n_samp],
            jnp.concatenate(src_parts)[:n_samp],
        )
    parts = [run(b * B) for b in range(n_blocks)]
    return jnp.concatenate(parts, axis=1)[:n_src, :n_samp]
