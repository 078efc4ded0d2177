"""Mesh-sharded detection kernels (shard_map wrappers).

Replaces the reference's process/file-lock distribution (SURVEY.md section
2.4 rows P3-P8) with a single logical program:

  - source / template axes shard trivially across devices;
  - the time axis shards in contiguous chunks with a one-sided right-halo
    exchange (`ppermute`) of length max(moveout) (+ template_len for the
    matched filter), so a sharded scan is bit-identical to the monolithic
    one (the reference instead relies on 500-s buffer margins and trims edge
    detections, BPMF/similarity_search.py:276-286);
  - the max/argmax over a sharded source axis is a pmax followed by a pmin
    over the tying indices, preserving the reference's first-max semantics.

All wrappers assert sharded == unsharded in the test suite.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

import importlib

# the submodules share names with the functions re-exported by ops/__init__,
# so resolve them through sys.modules rather than attribute access
_bp = importlib.import_module("seismic_bpmf_tpu.ops.beamform")
_mf = importlib.import_module("seismic_bpmf_tpu.ops.matched_filter")


def _right_halo(x, axis_name: str, halo: int):
    """Append each device's left-neighbor view of the next chunk.

    Device i receives the first `halo` samples of device i+1's chunk along
    the last axis; the last device receives zeros (matching the zero padding
    of the global data end).
    """
    n = jax.lax.axis_size(axis_name)
    head = jax.lax.slice_in_dim(x, 0, halo, axis=-1)
    perm = [(i, i - 1) for i in range(1, n)]
    recv = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([x, recv], axis=-1)


def _both_halos(x, axis_name: str, left: int, right: int):
    """Exchange halos in both directions, both sliced from the ORIGINAL
    chunk: device i prepends the last `left` samples of device i-1's chunk
    (zeros on device 0 — the global data start padding) and appends the
    first `right` samples of device i+1's chunk (zeros on the last
    device).  A left halo is needed when template moveouts are negative:
    a chunk's first lags read before the chunk."""
    n = jax.lax.axis_size(axis_name)
    parts = [x]
    if right:
        head = jax.lax.slice_in_dim(x, 0, right, axis=-1)
        perm = [(i, i - 1) for i in range(1, n)]
        parts.append(jax.lax.ppermute(head, axis_name, perm))
    if left:
        tail = jax.lax.slice_in_dim(
            x, x.shape[-1] - left, x.shape[-1], axis=-1
        )
        perm = [(i, i + 1) for i in range(n - 1)]
        parts.insert(0, jax.lax.ppermute(tail, axis_name, perm))
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Matched filter: mesh ('tp', 'time')
# ---------------------------------------------------------------------------

def matched_filter_sharded(
    templates,
    moveouts,
    weights,
    data,
    mesh: Mesh,
    step: int = 1,
    tp_axis: str = "tp",
    time_axis: str = "time",
):
    """Matched filter with the template bank sharded over `tp_axis` and the
    continuous data sharded over `time_axis` with halo exchange.

    Matches `ops.matched_filter.matched_filter(..., network_sum=True)`.
    Negative moveouts (template windows opening before the reference
    phase, the usual Template convention) are handled with a left-halo
    exchange of size -min(moveout).
    """
    templates = np.asarray(templates, np.float32)
    moveouts = np.asarray(moveouts, np.int32)
    weights = np.asarray(weights, np.float32)
    data = jnp.asarray(data, jnp.float32)

    n_tp, n_sta, n_comp, L = templates.shape
    n_ch = n_sta * n_comp
    n_samp = data.shape[-1]
    n_corr = (n_samp - L) // step + 1
    max_mv = int(moveouts.max(initial=0))
    pad_left = -min(0, int(moveouts.min(initial=0)))
    halo = max_mv + L  # window of the last local lag reaches chunk+halo-1

    n_tp_dev = mesh.shape[tp_axis] if tp_axis in mesh.shape else 1
    n_t_dev = mesh.shape[time_axis] if time_axis in mesh.shape else 1

    # pad template axis to a multiple of the template-shard count
    pad_tp = (-n_tp) % n_tp_dev
    if pad_tp:
        templates = np.pad(templates, ((0, pad_tp), (0, 0), (0, 0), (0, 0)))
        moveouts = np.pad(moveouts, ((0, pad_tp), (0, 0), (0, 0)))
        weights = np.pad(weights, ((0, pad_tp), (0, 0), (0, 0)))
    # pad the time axis so each chunk is equal and a multiple of step
    chunk = math.ceil(n_samp / n_t_dev)
    chunk = math.ceil(chunk / step) * step
    pad_t = n_t_dev * chunk - n_samp
    if pad_t:
        data = jnp.pad(data, ((0, 0), (0, 0), (0, pad_t)))
    if chunk < max(halo, pad_left) and n_t_dev > 1:
        raise ValueError(
            f"time chunk ({chunk}) smaller than halo "
            f"({max(halo, pad_left)}); use fewer time shards"
        )

    tp_flat = templates.reshape(-1, n_ch, L)
    tp_dm = tp_flat - tp_flat.mean(axis=-1, keepdims=True)
    band = jnp.asarray(_mf._build_band(tp_dm))
    x_norm = jnp.asarray(
        np.sqrt((tp_dm.astype(np.float64) ** 2).sum(-1)), jnp.float32
    )
    ones_band = jnp.asarray(_mf._ones_band(L))
    mv_flat = jnp.asarray(moveouts.reshape(-1, n_ch))
    w_flat = jnp.asarray(weights.reshape(-1, n_ch))
    data_flat = data.reshape(n_ch, -1)
    lags_per_chunk = chunk // step

    def body(band_l, xn_l, mv_l, w_l, data_l):
        t_idx = jax.lax.axis_index(time_axis)
        if n_t_dev > 1:
            data_ext = _both_halos(data_l, time_axis, pad_left, halo)
        else:
            data_ext = jnp.pad(data_l, ((0, 0), (pad_left, halo)))
        # data_ext[0] sits at absolute chunk start - pad_left; _mf_block's
        # padded-coordinate convention (block_start = padded index of the
        # block's first sample) makes that exactly t_idx * chunk
        cc = _mf._mf_block(
            band_l,
            xn_l,
            ones_band,
            mv_l,
            w_l,
            data_ext,
            t_idx * chunk,
            step=step,
            network_sum=True,
            n_corr_block=lags_per_chunk,
            n_samp=n_samp,
            pad_left=pad_left,
            L=L,
        )
        return cc

    tp_spec = tp_axis if tp_axis in mesh.shape else None
    t_spec = time_axis if time_axis in mesh.shape else None
    out = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(tp_spec),
            P(tp_spec),
            P(tp_spec),
            P(tp_spec),
            P(None, t_spec),
        ),
        out_specs=P(tp_spec, t_spec),
    )(band, x_norm, mv_flat, w_flat, data_flat)
    return out[:n_tp, :n_corr]


# ---------------------------------------------------------------------------
# Beamforming: mesh ('src', 'time')
# ---------------------------------------------------------------------------

def beamform_sharded(
    features,
    moveouts,
    weights_phases,
    weights_sources,
    mesh: Mesh,
    reduce: str = "max",
    out_of_bounds: str = "strict",
    engine: str = "onehot",
    src_axis: str = "src",
    time_axis: str = "time",
    time_block: int = 16384,
    src_block: int = 512,
):
    """Beamforming with the source grid sharded over `src_axis` and the
    data time axis sharded over `time_axis` (right-halo exchange).

    Matches `ops.beamform.beamform`.  Moveouts must be non-negative.
    """
    assert reduce in ("max", "none")
    features = jnp.asarray(features, jnp.float32)
    n_sta, n_comp, n_samp = features.shape
    mv_flat, w_flat, mv_lo, mv_hi = _bp._flatten_moveouts(
        moveouts, weights_phases, weights_sources
    )
    n_src, n_sp = mv_flat.shape
    assert mv_flat.min(initial=0) >= 0, "moveouts must be non-negative"
    strict = out_of_bounds == "strict"
    max_mv = int(mv_flat.max(initial=0))
    M = max_mv + 1

    n_s_dev = mesh.shape[src_axis] if src_axis in mesh.shape else 1
    n_t_dev = mesh.shape[time_axis] if time_axis in mesh.shape else 1

    g = _bp.fold_components(features, weights_phases)  # (n_sp, n_samp)

    # pad sources to multiple of (n_s_dev * src_block)
    src_block = min(src_block, math.ceil(n_src / n_s_dev))
    pad_src = (-n_src) % (n_s_dev * src_block)
    if pad_src:
        mv_flat = np.pad(mv_flat, ((0, pad_src), (0, 0)))
        w_flat = np.pad(w_flat, ((0, pad_src), (0, 0)))
        mv_lo = np.pad(mv_lo, (0, pad_src))
        mv_hi = np.pad(mv_hi, (0, pad_src))
    n_src_pad = mv_flat.shape[0]
    n_src_local = n_src_pad // n_s_dev

    # pad/shard time into equal chunks, blocked by B inside each shard
    chunk = math.ceil(n_samp / n_t_dev)
    B = min(time_block, chunk)
    chunk = math.ceil(chunk / B) * B
    pad_t = n_t_dev * chunk - n_samp
    g_p = jnp.pad(g, ((0, 0), (0, pad_t)))
    # last block slices up to chunk + max_mv - 1 in both engines
    halo = max_mv
    if n_t_dev > 1 and chunk < halo:
        raise ValueError(
            f"time chunk ({chunk}) smaller than halo ({halo}); "
            f"use fewer time shards or a smaller time_block"
        )
    n_blocks = chunk // B

    mvj = jnp.asarray(mv_flat)
    wj = jnp.asarray(w_flat)
    loj = jnp.asarray(mv_lo)
    hij = jnp.asarray(mv_hi)

    def body(g_l, mv_l, w_l, lo_l, hi_l):
        s_idx = (
            jax.lax.axis_index(src_axis) if src_axis in mesh.shape
            else jnp.int32(0)
        )
        t_idx = (
            jax.lax.axis_index(time_axis) if time_axis in mesh.shape
            else jnp.int32(0)
        )
        src_ofs = s_idx * n_src_local
        g_ext = (
            _right_halo(g_l, time_axis, halo) if n_t_dev > 1
            else jnp.pad(g_l, ((0, 0), (0, halo)))
        )

        outs_max, outs_src, outs_beam = [], [], []
        for b in range(n_blocks):
            t0 = b * B
            t_base = t_idx * chunk + t0
            if engine == "onehot":
                r = _bp._bp_time_block_onehot(
                    g_ext, mv_l, w_l, lo_l, hi_l,
                    t0, t_base, src_ofs, jnp.int32(n_src),
                    B=B, M=M, n_samp=n_samp, win_off=0,
                    strict=strict, reduce=reduce, src_block=src_block,
                )
            else:
                r = _bp._bp_time_block_gather(
                    g_ext, mv_l, w_l, lo_l, hi_l,
                    t0, t_base, src_ofs, jnp.int32(n_src),
                    B=B, n_samp=n_samp,
                    strict=strict, reduce=reduce, src_block=src_block,
                )
            if reduce == "max":
                outs_max.append(r[0])
                outs_src.append(r[1])
            else:
                outs_beam.append(r)

        if reduce == "none":
            return jnp.concatenate(outs_beam, axis=1)

        val = jnp.concatenate(outs_max)
        src = jnp.concatenate(outs_src)
        if src_axis in mesh.shape and n_s_dev > 1:
            vmax = jax.lax.pmax(val, src_axis)
            src_c = jnp.where(val == vmax, src, jnp.int32(2**30))
            src = jax.lax.pmin(src_c, src_axis)
            val = vmax
        return val, src

    src_spec = src_axis if src_axis in mesh.shape else None
    time_spec = time_axis if time_axis in mesh.shape else None

    if reduce == "max":
        out_specs = (P(time_spec), P(time_spec))
    else:
        out_specs = P(src_spec, time_spec)

    out = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(None, time_spec),
            P(src_spec, None),
            P(src_spec, None),
            P(src_spec),
            P(src_spec),
        ),
        out_specs=out_specs,
    )(g_p, mvj, wj, loj, hij)

    if reduce == "max":
        return out[0][:n_samp], out[1][:n_samp]
    return out[:n_src, :n_samp]


def matched_filter_sharded_pallas(
    templates,
    moveouts,
    weights,
    data,
    mesh: Mesh,
    step: int = 1,
    lag_block: int = 2048,
    tp_axis: str = "tp",
    time_axis: str = "time",
    interpret: bool = False,
    precision: str = "highest",
):
    """Production multi-chip matched filter: the fused Pallas kernel runs
    per shard with the template bank sharded over `tp_axis` and the
    continuous data sharded over `time_axis` (right-halo ppermute sized
    template_len + max_moveout).

    Matches `ops.pallas_mf.matched_filter_pallas` (and the oracle) exactly:
    each lag's windows are masked against the *global* data bounds via the
    kernel's per-shard base offset, so sharded == unsharded.
    """
    import importlib

    pmf = importlib.import_module("seismic_bpmf_tpu.ops.pallas_mf")

    templates = np.asarray(templates, np.float32)
    moveouts = np.asarray(moveouts, np.int64)
    weights = np.asarray(weights, np.float32)
    data = np.asarray(data, np.float32)
    n_tp, n_sta, n_comp, L = templates.shape
    n_samp = data.shape[-1]

    n_tp_dev = mesh.shape.get(tp_axis, 1)
    n_t_dev = mesh.shape.get(time_axis, 1)

    # pad the template axis so each shard holds an 8-multiple
    per_dev = -(-n_tp // n_tp_dev)
    per_dev = ((per_dev + 7) // 8) * 8
    n_tp_pad_total = per_dev * n_tp_dev
    pad_tp = n_tp_pad_total - n_tp
    if pad_tp:
        templates = np.pad(templates, ((0, pad_tp),) + ((0, 0),) * 3)
        moveouts = np.pad(moveouts, ((0, pad_tp),) + ((0, 0),) * 2)
        weights = np.pad(weights, ((0, pad_tp),) + ((0, 0),) * 2)

    plan = pmf.PallasMatchedFilterPlan(
        templates, moveouts, weights, n_samp,
        lag_block=lag_block, interpret=interpret, precision=precision,
    )
    split = plan.precision_name == "high"
    B, LM_pad = plan.B, plan.LM_pad
    # sharded lag region: cover all real data so the last shard's halo is
    # genuinely zero, and divide evenly into B-multiples per time shard
    quantum = B * n_t_dev
    n_corr_shard = -(-max(plan.n_corr_unit, plan.pad_left + n_samp) // quantum)
    n_corr_shard *= quantum
    chunk = n_corr_shard // n_t_dev
    if n_t_dev > 1 and chunk < LM_pad:
        raise ValueError(
            f"time chunk ({chunk}) smaller than halo ({LM_pad}); "
            f"use fewer time shards or a larger lag_block"
        )

    # padded data covering the sharded region + one halo
    n_ch_pad = data.shape[0] * data.shape[1]
    n_ch_pad = ((n_ch_pad + 7) // 8) * 8
    ext = n_corr_shard + LM_pad
    data_pad = np.zeros((n_ch_pad, ext), np.float32)
    hi_clip = min(ext, plan.pad_left + n_samp)
    data_pad[: plan.n_ch, plan.pad_left : hi_clip] = (
        data.reshape(plan.n_ch, n_samp)[:, : hi_clip - plan.pad_left]
    )

    tp_spec = tp_axis if tp_axis in mesh.shape else None
    t_spec = time_axis if time_axis in mesh.shape else None

    gather = plan.ysel == "gather"

    def body(kb_l, fa_l, fb_l, sel_l, mv_l, hi_l, lo_l, data_l):
        t_idx = (
            jax.lax.axis_index(time_axis) if t_spec is not None
            else jnp.int32(0)
        )
        data_ext = (
            _right_halo(data_l, time_axis, LM_pad) if n_t_dev > 1
            else jnp.pad(data_l, ((0, 0), (0, LM_pad)))
        )
        base = jnp.full((1, 1), t_idx * chunk, jnp.float32)
        common = dict(
            L=plan.L, B=B, LM_pad=LM_pad, n_corr_pad=chunk,
            n_ch=plan.n_ch, Q=plan.Q, interpret=interpret,
        )
        common.update(dense=plan.dense, gather=gather, diag=plan.diag)
        if split:
            return pmf._mf_pallas_call_split(
                fa_l, fb_l, sel_l, hi_l, lo_l, data_ext, base, kb=kb_l,
                mv=mv_l, **common,
            )
        return pmf._mf_pallas_call(
            fa_l, sel_l, hi_l, lo_l, data_ext, base, kb=kb_l,
            mv=mv_l, precision=plan.precision, **common,
        )

    fa = plan.filt_hi if split else plan.filt
    fb = plan.filt_lo if split else plan.filt  # unused in the f32 path
    out = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(None, None),
            P(None, tp_spec, None),
            P(None, tp_spec, None),
            # gather mode: sel is a (1, 1) dummy (replicated); the
            # per-(channel, template) moveout table shards on templates
            P(None, None) if gather else P(None, tp_spec, None),
            P(None, tp_spec),
            P(None, tp_spec),
            P(None, tp_spec),
            P(None, t_spec),
        ),
        out_specs=P(tp_spec, t_spec),
    )(plan.kb, fa, fb, plan.sel, plan.mv_table, plan.hi, plan.lo,
      jnp.asarray(data_pad[:, :n_corr_shard]))
    out = out[:n_tp, : plan.n_corr_unit]
    if step > 1:
        out = out[:, ::step][:, : (n_samp - L) // step + 1]
    return out


def beamform_sharded_pallas(
    features,
    moveouts,
    weights_phases,
    weights_sources,
    mesh: Mesh,
    reduce: str = "max",
    out_of_bounds: str = "strict",
    time_block: int = 1024,
    src_block: int = 512,
    src_axis: str = "src",
    time_axis: str = "time",
    interpret: bool = False,
    precision: str = "highest",
):
    """Production multi-chip beamformer: the fused Pallas kernel runs per
    shard with the source grid sharded over `src_axis` and the folded
    features sharded over `time_axis` (right-halo ppermute sized
    max(moveout)).  The global max/argmax over sources is a pmax followed by
    a pmin over tying global indices (first-max semantics).

    Matches `ops.pallas_bp.beamform_pallas` exactly.
    """
    import importlib

    pbp = importlib.import_module("seismic_bpmf_tpu.ops.pallas_bp")

    assert reduce in ("max", "none")
    features = np.asarray(features, np.float32)
    n_sta, n_comp, n_samp = features.shape
    mv_flat, w_flat, mv_lo, mv_hi = _bp._flatten_moveouts(
        moveouts, weights_phases, weights_sources
    )
    n_src, n_sp = mv_flat.shape
    assert mv_flat.min(initial=0) >= 0, "moveouts must be non-negative"
    max_mv = int(mv_flat.max(initial=0))

    n_s_dev = mesh.shape.get(src_axis, 1)
    n_t_dev = mesh.shape.get(time_axis, 1)

    B = time_block
    S = pbp._round_up(
        min(src_block, max(-(-n_src // n_s_dev), 1)), 128
    )
    M = pbp._round_up(max_mv + 1, 128)
    # per-shard source count: multiple of S
    s_local = pbp._round_up(-(-n_src // n_s_dev), S)
    n_src_pad = s_local * n_s_dev
    n_sp_pad = pbp._round_up(n_sp, 8)

    # per-shard time chunk: multiple of B, sharded region covers all data
    quantum = B * n_t_dev
    n_shard_cols = -(-n_samp // quantum) * quantum
    chunk = n_shard_cols // n_t_dev
    if n_t_dev > 1 and chunk < M:
        raise ValueError(
            f"time chunk ({chunk}) smaller than halo ({M}); use fewer "
            f"time shards or a larger time_block"
        )

    g = np.asarray(_bp.fold_components(features, weights_phases))
    g_pad = np.zeros((n_sp_pad, n_shard_cols), np.float32)
    g_pad[:n_sp, :n_samp] = g

    mv_in = np.zeros((n_sp, n_src_pad), np.int32)
    mv_in[:, :n_src] = mv_flat.T
    w_in = np.zeros((n_sp, n_src_pad), np.float32)
    w_in[:, :n_src] = w_flat.T
    # per-shard 8-padded block-row bounds: shard d's rows start at
    # d * nb_local_pad so an even row split lands each shard's own blocks
    nb_local = s_local // S
    nb_local_pad = pbp._round_up(nb_local, 8)
    lo_flat = np.zeros((n_src_pad,), np.int32)
    hi_flat = np.zeros((n_src_pad,), np.int32)
    lo_flat[:n_src] = mv_lo
    hi_flat[:n_src] = mv_hi
    lo_in = np.zeros((n_s_dev * nb_local_pad, S), np.int32)
    hi_in = np.zeros((n_s_dev * nb_local_pad, S), np.int32)
    for dd in range(n_s_dev):
        rows = lo_flat[dd * s_local : (dd + 1) * s_local].reshape(nb_local, S)
        lo_in[dd * nb_local_pad : dd * nb_local_pad + nb_local] = rows
        rows = hi_flat[dd * s_local : (dd + 1) * s_local].reshape(nb_local, S)
        hi_in[dd * nb_local_pad : dd * nb_local_pad + nb_local] = rows
    qbase, nq_blk, mv_in, n_q = pbp._local_bases(mv_in, w_in, S, M)

    s_spec = src_axis if src_axis in mesh.shape else None
    t_spec = time_axis if time_axis in mesh.shape else None
    reduce_max = reduce == "max"

    def body(qbase_l, nq_l, mv_l, w_l, lo_l, hi_l, g_l):
        t_idx = (
            jax.lax.axis_index(time_axis) if t_spec is not None
            else jnp.int32(0)
        )
        s_idx = (
            jax.lax.axis_index(src_axis) if s_spec is not None
            else jnp.int32(0)
        )
        g_ext = (
            _right_halo(g_l, time_axis, M) if n_t_dev > 1
            else jnp.pad(g_l, ((0, 0), (0, M)))
        )
        base = jnp.stack(
            [t_idx * chunk, s_idx * s_local]
        ).reshape(1, 2).astype(jnp.int32)
        out = pbp._bp_pallas_call(
            qbase_l, nq_l, mv_l, w_l, lo_l, hi_l, g_ext, base,
            B=B, M=M, S=S, n_q=n_q, n_samp=n_samp, n_src=n_src,
            strict=(out_of_bounds == "strict"), reduce_max=reduce_max,
            interpret=interpret, mode=pbp._precision_mode(precision),
            precision=jax.lax.Precision.HIGHEST,
        )
        if not reduce_max:
            return out
        val, idx = out[0][0:1, :], out[1][0:1, :]
        if s_spec is not None and n_s_dev > 1:
            vmax = jax.lax.pmax(val, src_axis)
            idx_c = jnp.where(val == vmax, idx, jnp.int32(2**30))
            idx = jax.lax.pmin(idx_c, src_axis)
            val = vmax
        return val, idx

    in_specs = (
        P(None, s_spec),
        P(None, s_spec),
        P(None, s_spec),
        P(None, s_spec),
        P(s_spec, None),
        P(s_spec, None),
        P(None, t_spec),
    )
    if reduce_max:
        out_specs = (P(None, t_spec), P(None, t_spec))
    else:
        out_specs = P(s_spec, t_spec)
    out = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=in_specs,
        out_specs=out_specs,
    )(
        jnp.asarray(qbase), jnp.asarray(nq_blk), jnp.asarray(mv_in),
        jnp.asarray(w_in),
        jnp.asarray(lo_in), jnp.asarray(hi_in), jnp.asarray(g_pad),
    )
    if reduce_max:
        return out[0][0, :n_samp], out[1][0, :n_samp]
    return out[:n_src, :n_samp]
