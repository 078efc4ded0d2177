"""Pallas TPU kernel for shift-and-stack beamforming.

MXU formulation of `ops.reference.beamform` (replaces `beampower`'s CUDA
gather loop).  Grid (time blocks, source blocks), source dim fastest, so the
output block for a time block stays resident in VMEM while the running
max/argmax accumulates across source blocks.  Per grid step:

  if g_s == 0: DMA the folded features g[sp, t0 : t0 + B + M] into VMEM
  for each station-phase sp:                 (fori, n_sp iterations)
    H128[r, :] = g[sp, t0 + r : ...]         (128 *static* shifted copies)
    for q in range(M / 128):
      Wq[r, i]  = w_src[i, sp] * (mv[i, sp] == 128 q + r)  (one-hot compare)
      beam     += Wq contracted with H128[:, 128 q : 128 q + B]   (MXU)
  strict mask; fake-source rows -> -inf; fold running (max, argmax) with
  first-max (smallest source index) tie-breaking, or write the beam block.

The one-hot matmul turns the gather-bound shift-and-stack into a
matmul-bound problem — the idiomatic TPU mapping of beamforming.  All lane
offsets are either static or provably 128-aligned, so no dynamic cross-lane
shifts are emitted.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .beamform import _flatten_moveouts, fold_components


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _precision_mode(precision: str) -> str:
    """Map the user-facing precision name to the kernel mode.

    Note: Mosaic lowers only Precision.DEFAULT/HIGHEST inside Pallas, so
    there is no XLA 'HIGH' rung here — the 3-pass idea is what 'high'
    (split2: explicit bf16 hi/lo ladder) already implements."""
    modes = {"highest": "f32", "high": "split2", "default": "bf16"}
    if precision not in modes:
        raise ValueError(f"unknown precision {precision!r}")
    return modes[precision]


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi = round-to-nearest-even bf16 of x,
    computed via integer bit arithmetic (a plain f32->bf16->f32 convert
    round-trip would be folded to identity by XLA's excess-precision pass,
    silently zeroing the lo component).  |x - hi| <= 2^-9 |x| and
    |x - hi - lo| <= 2^-18 |x|.  Finite inputs only."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    hi = jax.lax.bitcast_convert_type(
        rounded & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _make_bp_kernel(*, B, M, S, n_sp, n_src, n_samp, n_q, strict, reduce_max,
                    hoist_hankel, precision=jax.lax.Precision.HIGHEST,
                    mode="f32", diag=""):
    """mode: 'f32' (matmul the weighted one-hot at `precision`), 'split2'
    (precision ladder: PURE 0/1 one-hot — exact in bf16 — contracted against
    a 2-component bf16 split of the data Hankel, weights applied on the VPU
    after the matmul: 2 DEFAULT passes vs HIGHEST's 6 at ~1e-6 error) or
    'bf16' (single hi-component pass, ~2e-3 relative error on the data).
    Selection itself is EXACT in all modes — only the selected feature
    values round.

    diag: stage-removal diagnostics for hardware cost attribution
    ("noroll"/"noonehot"/"nosplit"/"nomask" — wrong beam values, timing
    only).  (A station-phase-loop unroll knob was removed after hardware
    sweeps: Mosaic lowers only unroll=1 or a full unroll, and the full
    unroll crashes the compiler at production sizes.)"""
    neg_inf = float(-jnp.inf)
    W = B + M

    def kernel(
        base_ref,    # (1, 2) int32 (SMEM): [abs time ofs, abs src ofs]
        qbase_ref,   # (8, n_sp) int32 (SMEM, 8-row window of the
                     #  (n_s_blocks_pad8, n_sp) table; row g_s % 8):
                     #  per-(src block, sp) 128-aligned moveout base — the
                     #  q sweep only covers the block's LOCAL moveout range
                     #  (big win on smooth, spatially-ordered grids).
                     #  Windowing keeps SMEM use O(n_sp), not O(n_sp *
                     #  n_blocks) (100+ stations x 100k+ sources)
        nq_ref,      # (8, n_sp) int32 (SMEM, windowed): live q blocks
                     #  (predicates the unrolled sweep)
        mv_ref,      # (n_sp, S) int32 (VMEM, windowed per src block),
                     #  LOCAL to qbase — windowing keeps VMEM use O(S),
                     #  not O(n_src) (100k+ source grids)
        w_ref,       # (n_sp, S) f32 (VMEM, windowed)
        lo_ref,      # (8, S) int32 used-mv min per source (windowed 8-row
                     #  group of the block-row layout; row g_s % 8 is this
                     #  source block's — a (n_src, 1) column would tile to
                     #  128 lanes and waste 128x the VMEM)
        hi_ref,      # (8, S) int32 used-mv max per source
        g_ref,       # (n_sp_pad, ext) f32 (ANY/HBM)
        *refs,
    ):
        if reduce_max:
            (val_ref, idx_ref, win_scratch, h_scratch, beam_scratch,
             dma_sem) = refs
        else:
            (out_ref, win_scratch, h_scratch, beam_scratch, dma_sem) = refs

        g_t = pl.program_id(0)
        g_s = pl.program_id(1)
        t0 = g_t * B
        s_ofs = pl.multiple_of(g_s * S, 128)

        def build_g127(sp):
            """G127[r, col] = g[sp, t0 + col + 127 - r]: the full 128-shift
            Hankel of a station-phase row in ONE strided roll."""
            row = win_scratch[pl.ds(sp, 1), :]
            h = jnp.broadcast_to(row, (128, W))
            if diag == "noroll":  # diagnostic: measure the roll cost
                return h
            return pltpu.roll(h, W - 127, 1, stride=1, stride_axis=0)

        @pl.when(g_s == 0)
        def _():
            dma = pltpu.make_async_copy(
                g_ref.at[:, pl.ds(t0, W)], win_scratch, dma_sem
            )
            dma.start()
            dma.wait()
            if hoist_hankel:
                # build the Hankels of every station-phase once per time
                # block (reused across the whole source sweep)
                def build_sp(sp, _):
                    h_scratch[pl.ds(sp * 128, 128), :] = build_g127(sp)
                    return 0

                jax.lax.fori_loop(0, n_sp, build_sp, 0)

        r_col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

        beam_scratch[...] = jnp.zeros((S, B), jnp.float32)

        dn = (((0,), (0,)), ((), ()))
        mm = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

        def sp_body(sp, carry):
            mv_row = mv_ref[pl.ds(sp, 1), :]  # (1, S)
            w_row = w_ref[pl.ds(sp, 1), :]    # (1, S)
            b0 = qbase_ref[g_s % 8, sp]  # 128-aligned local moveout base
            nq_sp = nq_ref[g_s % 8, sp]  # live q blocks for this block

            if hoist_hankel:
                h_base = sp * 128
            else:
                # large-network fallback: rebuild per (source block, sp) —
                # one roll, not 128 row copies — SKIPPED outright when no
                # source in the block uses this station-phase: with sparse
                # source weights (e.g. closest-K stations) most (sp,
                # block) pairs are dead and the roll dominated the VPU
                h_base = 0

                @pl.when(nq_sp > 0)
                def _():
                    h_scratch[...] = build_g127(sp)

            # unrolled at trace time, predicated per (sp, block): most
            # blocks of a smooth travel-time grid only span 1-2 octaves of
            # the global moveout range, so the guarded matmuls are skipped
            for q in range(n_q):
                @pl.when(q < nq_sp)
                def _(q=q):
                    # G127 layout: row r holds the shift 127 - r
                    if diag == "noonehot":  # diagnostic: constant select
                        onehot = jnp.broadcast_to(r_col == 127, (128, S))
                    else:
                        onehot = (mv_row - q * 128) == (127 - r_col)
                    hq = h_scratch[
                        pl.ds(h_base, 128),
                        pl.ds(pl.multiple_of(b0 + q * 128, 128), B),
                    ]
                    if mode == "f32":
                        contrib = mm(
                            onehot.astype(jnp.float32) * w_row, hq,
                            precision=precision,
                        )  # (S, B)
                    else:
                        # the Hankel stays f32 (Mosaic's strided rotate is
                        # 32-bit only); each (128, B) slice splits to a
                        # bf16 pair at use — ~1% VPU overhead per matmul
                        oh = onehot.astype(jnp.bfloat16)  # exact 0/1
                        if mode == "split2":
                            if diag == "nosplit":  # diagnostic: 1-pass
                                contrib = mm(oh, hq.astype(jnp.bfloat16))
                            else:
                                hh, hl = _split_bf16(hq)
                                contrib = mm(oh, hh) + mm(oh, hl)
                        else:
                            contrib = mm(oh, hq.astype(jnp.bfloat16))
                        # weights stay f32: applied on the VPU per source
                        contrib = contrib * jnp.transpose(w_row)
                    beam_scratch[...] = beam_scratch[...] + contrib

            return carry

        jax.lax.fori_loop(0, n_sp, sp_body, 0)
        beam = beam_scratch[...]

        t_abs = base_ref[0, 0] + t0 + lane  # (1, B)
        if strict and diag != "nomask":
            r8 = g_s % 8
            lo = jnp.transpose(lo_ref[pl.ds(r8, 1), :])  # (S, 1)
            hi = jnp.transpose(hi_ref[pl.ds(r8, 1), :])
            ok = (t_abs + lo >= 0) & (t_abs + hi < n_samp)
            beam = jnp.where(ok, beam, 0.0)

        if not reduce_max:
            out_ref[...] = beam
            return

        src_ids = base_ref[0, 1] + s_ofs + row  # (S, 1) global ids
        beam = jnp.where(src_ids < n_src, beam, neg_inf)
        blk_val = jnp.max(beam, axis=0, keepdims=True)  # (1, B)
        cand = jnp.where(beam == blk_val, src_ids, jnp.int32(2**30))
        blk_idx = jnp.min(cand, axis=0, keepdims=True)  # (1, B)

        @pl.when(g_s == 0)
        def _():
            val_ref[...] = jnp.broadcast_to(blk_val, val_ref.shape)
            idx_ref[...] = jnp.broadcast_to(blk_idx, idx_ref.shape)

        @pl.when(g_s > 0)
        def _():
            cur_val = val_ref[0:1, :]
            cur_idx = idx_ref[0:1, :]
            take = blk_val > cur_val
            new_val = jnp.where(take, blk_val, cur_val)
            new_idx = jnp.where(take, blk_idx, cur_idx)
            val_ref[...] = jnp.broadcast_to(new_val, val_ref.shape)
            idx_ref[...] = jnp.broadcast_to(new_idx, idx_ref.shape)

    return kernel


def _bounds_blocks(mv_lo, mv_hi, n_src: int, n_src_pad: int, S: int):
    """(n_src,) per-source moveout bounds -> (n_s_blocks_pad8, S) block-row
    layout (a (n_src, 1) column input would tile to 128 lanes in VMEM;
    rows padded to a multiple of 8 for the kernel's 8-row windows)."""
    n_blocks = n_src_pad // S
    nb_pad = _round_up(n_blocks, 8)
    lo = np.zeros((nb_pad * S,), np.int32)
    hi = np.zeros((nb_pad * S,), np.int32)
    lo[:n_src] = mv_lo
    hi[:n_src] = mv_hi
    return lo.reshape(nb_pad, S), hi.reshape(nb_pad, S)


def _local_bases(mv_in: np.ndarray, w_in: np.ndarray, S: int, M: int):
    """Per-(station-phase, source-block) 128-aligned moveout bases.

    Returns (qbase (n_sp, n_blocks) int32, nq (n_sp, n_blocks) int32,
    mv_local (n_sp, n_src_pad) int32, n_q int) such that
    mv = qbase[sp, blk] + mv_local with 0 <= mv_local < 128 * nq[sp, blk]
    and n_q = max(nq).  Zero-weight entries are ignored when computing the
    block ranges (their one-hot rows contribute nothing) and remapped to 0;
    fully-empty blocks get nq = 0 so the kernel skips them outright.  Bases
    are clamped to M - 128*n_q so every q sweep stays inside the Hankel's
    column range.
    """
    n_sp, n_src_pad = mv_in.shape
    n_blocks = n_src_pad // S
    mv_b = mv_in.reshape(n_sp, n_blocks, S)
    mask = (w_in > 0).reshape(n_sp, n_blocks, S)
    big = np.iinfo(np.int32).max
    mv_min = np.where(mask, mv_b, big).min(axis=-1)
    mv_max = np.where(mask, mv_b, -1).max(axis=-1)
    empty = ~mask.any(axis=-1)
    mv_min = np.where(empty, 0, mv_min)
    mv_max = np.where(empty, 0, mv_max)
    qbase = (mv_min // 128) * 128
    n_q = int(np.max(mv_max - qbase)) // 128 + 1
    qbase = np.minimum(qbase, M - 128 * n_q).astype(np.int32)
    nq = ((mv_max - qbase) // 128 + 1).astype(np.int32)
    nq[empty] = 0
    mv_local = mv_b - qbase[:, :, None]
    mv_local = np.where(mask, mv_local, 0).astype(np.int32)
    return qbase, nq, mv_local.reshape(n_sp, n_src_pad), n_q


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "M", "S", "n_q", "n_samp", "n_src", "strict", "reduce_max",
        "interpret", "precision", "hoist_hankel", "mode", "diag",
    ),
)
def _bp_pallas_call(
    qbase, nq, mv, w, lo, hi, g_pad, base=None,
    *, B, M, S, n_q, n_samp, n_src, strict, reduce_max, interpret=False,
    precision=jax.lax.Precision.HIGHEST, hoist_hankel=None, mode="f32",
    diag="",
):
    if base is None:
        base = jnp.zeros((1, 2), jnp.int32)
    n_sp = mv.shape[0]
    if hoist_hankel is None:
        # hoist when the all-sp Hankel fits the VMEM budget (110 MB limit
        # minus window/beam/block buffers); otherwise the Hankel rebuilds
        # per (source block, sp) with one strided roll each (viable for
        # 100+ station networks).  Hoisting is both faster (rolls once
        # per time block instead of per source block) and ~7x quicker for
        # Mosaic to compile at production sizes
        hoist_hankel = n_sp * 128 * (B + M) * 4 <= 72 * 1024 * 1024
    n_src_pad = mv.shape[1]
    n_sp_pad = g_pad.shape[0]
    n_t_blocks = (g_pad.shape[1] - M) // B
    n_s_blocks = n_src_pad // S
    W = B + M
    # (n_sp, n_blocks) tables -> transposed (n_blocks_pad8, n_sp) so the
    # kernel takes an 8-row SMEM window per source block (O(n_sp) SMEM)
    nb_pad = _round_up(n_s_blocks, 8)
    qbase_t = jnp.pad(qbase.T, ((0, nb_pad - n_s_blocks), (0, 0)))
    nq_t = jnp.pad(nq.T, ((0, nb_pad - n_s_blocks), (0, 0)))

    kernel = _make_bp_kernel(
        B=B, M=M, S=S, n_sp=n_sp, n_src=n_src, n_samp=n_samp, n_q=n_q,
        strict=strict, reduce_max=reduce_max, precision=precision,
        hoist_hankel=hoist_hankel, mode=mode, diag=diag,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # base
        pl.BlockSpec((8, n_sp), lambda t, s: (s // 8, 0),
                     memory_space=pltpu.SMEM),  # qbase (8-row window)
        pl.BlockSpec((8, n_sp), lambda t, s: (s // 8, 0),
                     memory_space=pltpu.SMEM),  # nq (8-row window)
        pl.BlockSpec((n_sp, S), lambda t, s: (0, s)),  # mv (windowed)
        pl.BlockSpec((n_sp, S), lambda t, s: (0, s)),  # w (windowed)
        pl.BlockSpec((8, S), lambda t, s: (s // 8, 0)),  # lo (8-row window)
        pl.BlockSpec((8, S), lambda t, s: (s // 8, 0)),  # hi (8-row window)
        pl.BlockSpec(memory_space=pl.ANY),   # g (manual DMA)
    ]
    scratch = [
        pltpu.VMEM((n_sp_pad, W), jnp.float32),
        pltpu.VMEM((n_sp * 128 if hoist_hankel else 128, W), jnp.float32),
        pltpu.VMEM((S, B), jnp.float32),  # beam accumulator
        pltpu.SemaphoreType.DMA,
    ]
    if reduce_max:
        out_shape = (
            jax.ShapeDtypeStruct((8, n_t_blocks * B), jnp.float32),
            jax.ShapeDtypeStruct((8, n_t_blocks * B), jnp.int32),
        )
        out_specs = (
            pl.BlockSpec((8, B), lambda t, s: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda t, s: (0, t),
                         memory_space=pltpu.VMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct(
            (n_src_pad, n_t_blocks * B), jnp.float32
        )
        out_specs = pl.BlockSpec(
            (S, B), lambda t, s: (s, t), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=(n_t_blocks, n_s_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(base, qbase_t, nq_t, mv, w, lo, hi, g_pad)


def beamform_pallas(
    features,
    moveouts,
    weights_phases,
    weights_sources,
    reduce: str = "max",
    out_of_bounds: str = "strict",
    time_block: int = 1024,
    src_block: int = 512,
    interpret: bool = False,
    precision: str = "highest",
    hoist_hankel: bool = None,
    diag: str = "",
):
    """Beamform via the fused Pallas kernel.

    Same semantics as `ops.reference.beamform`.  Moveouts must be >= 0
    (true for BPMF moveouts relative to the first arrival).

    precision: 'highest' = 6-pass f32 matmuls (~1e-6 abs error on O(1)
    features); 'high' = 2-component bf16 data split + exact one-hot
    (2 passes, ~1e-6); 'default' = single bf16 pass (~2e-3 relative on
    the selected feature values, fastest).  Selection/argmax indices are
    exact in every mode up to value rounding at near-ties.
    """
    assert reduce in ("max", "none")
    mode = _precision_mode(precision)
    features = np.asarray(features, np.float32)
    n_sta, n_comp, n_samp = features.shape
    mv_flat, w_flat, mv_lo, mv_hi = _flatten_moveouts(
        moveouts, weights_phases, weights_sources
    )
    n_src, n_sp = mv_flat.shape
    assert mv_flat.min(initial=0) >= 0, "moveouts must be non-negative"
    max_mv = int(mv_flat.max(initial=0))

    B = time_block
    # source-block offsets must be 128-aligned for the VMEM row slices
    S = _round_up(min(src_block, max(n_src, 1)), 128)
    M = _round_up(max_mv + 1, 128)
    n_src_pad = _round_up(n_src, S)
    n_sp_pad = _round_up(n_sp, 8)
    n_t_blocks = math.ceil(n_samp / B)

    g = np.asarray(fold_components(features, weights_phases))  # (n_sp, n_samp)
    ext = n_t_blocks * B + M
    g_pad = np.zeros((n_sp_pad, ext), np.float32)
    g_pad[:n_sp, :n_samp] = g

    mv_in = np.zeros((n_sp, n_src_pad), np.int32)
    mv_in[:, :n_src] = mv_flat.T
    w_in = np.zeros((n_sp, n_src_pad), np.float32)
    w_in[:, :n_src] = w_flat.T
    lo_in, hi_in = _bounds_blocks(mv_lo, mv_hi, n_src, n_src_pad, S)
    qbase, nq, mv_local, n_q = _local_bases(mv_in, w_in, S, M)

    out = _bp_pallas_call(
        jnp.asarray(qbase), jnp.asarray(nq), jnp.asarray(mv_local),
        jnp.asarray(w_in),
        jnp.asarray(lo_in), jnp.asarray(hi_in), jnp.asarray(g_pad),
        B=B, M=M, S=S, n_q=n_q, n_samp=n_samp, n_src=n_src,
        strict=(out_of_bounds == "strict"), reduce_max=(reduce == "max"),
        interpret=interpret, mode=mode, hoist_hankel=hoist_hankel,
        diag=diag,
        precision=jax.lax.Precision.HIGHEST,
    )
    if reduce == "max":
        val, idx = out
        return val[0, :n_samp], idx[0, :n_samp]
    return out[:n_src, :n_samp]


class PallasBeamformPlan:
    """Device-resident beamforming plan: moveouts/weights transferred once,
    then applied to any number of feature sets (e.g. consecutive days).

    The features themselves can be passed as device arrays (e.g. PhaseNet
    probabilities already on device) so nothing but the raw day transfers.
    """

    def __init__(
        self,
        moveouts,
        weights_phases,
        weights_sources,
        n_samp: int,
        reduce: str = "max",
        out_of_bounds: str = "strict",
        time_block: int = 1024,
        src_block: int = 512,
        interpret: bool = False,
        precision: str = "highest",
        diag: str = "",
    ):
        assert reduce in ("max", "none")
        self.mode = _precision_mode(precision)
        self.precision = jax.lax.Precision.HIGHEST
        self.diag = diag
        mv_flat, w_flat, mv_lo, mv_hi = _flatten_moveouts(
            moveouts, weights_phases, weights_sources
        )
        assert mv_flat.min(initial=0) >= 0, "moveouts must be non-negative"
        self.weights_phases = jnp.asarray(weights_phases, jnp.float32)
        self.n_samp = n_samp
        self.reduce = reduce
        self.strict = out_of_bounds == "strict"
        self.interpret = interpret
        n_src, n_sp = mv_flat.shape
        self.n_src, self.n_sp = n_src, n_sp
        max_mv = int(mv_flat.max(initial=0))
        self.B = time_block
        self.S = _round_up(min(src_block, max(n_src, 1)), 128)
        self.M = _round_up(max_mv + 1, 128)
        self.n_src_pad = _round_up(n_src, self.S)
        self.n_sp_pad = _round_up(n_sp, 8)
        self.n_t_blocks = math.ceil(n_samp / self.B)
        self.ext = self.n_t_blocks * self.B + self.M

        mv_in = np.zeros((n_sp, self.n_src_pad), np.int32)
        mv_in[:, :n_src] = mv_flat.T
        w_in = np.zeros((n_sp, self.n_src_pad), np.float32)
        w_in[:, :n_src] = w_flat.T
        lo_in, hi_in = _bounds_blocks(mv_lo, mv_hi, n_src, self.n_src_pad,
                                      self.S)
        qbase, nq, mv_local, self.n_q = _local_bases(
            mv_in, w_in, self.S, self.M
        )
        self.qbase = jnp.asarray(qbase)
        self.nq = jnp.asarray(nq)
        self.mv = jnp.asarray(mv_local)
        self.w = jnp.asarray(w_in)
        self.lo = jnp.asarray(lo_in)
        self.hi = jnp.asarray(hi_in)

    def fold_and_pad(self, features) -> jnp.ndarray:
        """(n_sta, n_comp, n_samp) features -> padded folded (n_sp_pad, ext).

        Accepts host or device arrays; all arithmetic runs on device.
        """
        g = fold_components(jnp.asarray(features, jnp.float32),
                            self.weights_phases)
        return jnp.pad(
            g,
            ((0, self.n_sp_pad - g.shape[0]),
             (0, self.ext - g.shape[1])),
        )

    def __call__(self, features):
        return self.call_folded(self.fold_and_pad(features))

    # max beam-points per XLA execution before the day auto-chunks: a
    # single whole-day call on a 100k+ source grid runs minutes on one
    # chip, which starves the host of progress and can trip remote-worker
    # RPC deadlines; ~2e10 points is a few seconds of device time
    CHUNK_POINTS = 2 * 10**10

    def call_folded(self, g_pad):
        """Run on an already folded+padded (n_sp_pad, ext) feature array
        (from `fold_and_pad`) — lets repeated scans skip the fold.

        Large problems (n_src * n_samp > CHUNK_POINTS, reduce='max')
        transparently run through `call_folded_chunked`, which is
        bit-identical to the single call."""
        total = self.n_src * self.n_samp
        if self.reduce == "max" and total > self.CHUNK_POINTS:
            n_chunks = min(-(-total // self.CHUNK_POINTS), self.n_t_blocks)
            return self.call_folded_chunked(g_pad, n_chunks)
        out = _bp_pallas_call(
            self.qbase, self.nq, self.mv, self.w, self.lo, self.hi, g_pad,
            B=self.B, M=self.M, S=self.S, n_q=self.n_q,
            n_samp=self.n_samp, n_src=self.n_src,
            strict=self.strict, reduce_max=(self.reduce == "max"),
            interpret=self.interpret, precision=self.precision,
            mode=self.mode, diag=self.diag,
        )
        if self.reduce == "max":
            return out[0][0, : self.n_samp], out[1][0, : self.n_samp]
        return out[: self.n_src, : self.n_samp]

    def call_folded_chunked(self, g_pad, n_chunks: int):
        """Full-scan result computed in `n_chunks` shorter device calls
        over the time axis (bit-identical to `call_folded`: each chunk
        kernel gets the absolute time offset via `base`, so strict-bounds
        masking sees global sample positions).  Bounds each XLA execution
        to seconds — large grids x full days would otherwise sit in a
        single multi-minute device call."""
        assert self.reduce == "max", "chunked path is for the max reduce"
        blocks_per = -(-self.n_t_blocks // n_chunks)
        vals, idxs = [], []
        for c in range(0, self.n_t_blocks, blocks_per):
            nb = min(blocks_per, self.n_t_blocks - c)
            t0 = c * self.B
            g_c = jax.lax.dynamic_slice_in_dim(
                g_pad, t0, nb * self.B + self.M, axis=1
            )
            base = jnp.asarray([[t0, 0]], jnp.int32)
            v, i = _bp_pallas_call(
                self.qbase, self.nq, self.mv, self.w, self.lo, self.hi,
                g_c, base,
                B=self.B, M=self.M, S=self.S, n_q=self.n_q,
                n_samp=self.n_samp, n_src=self.n_src,
                strict=self.strict, reduce_max=True,
                interpret=self.interpret, precision=self.precision,
                mode=self.mode, diag=self.diag,
            )
            vals.append(v[0])
            idxs.append(i[0])
        return (
            jnp.concatenate(vals)[: self.n_samp],
            jnp.concatenate(idxs)[: self.n_samp],
        )
