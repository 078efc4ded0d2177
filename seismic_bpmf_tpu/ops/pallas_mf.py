"""Pallas TPU kernel for the normalized matched filter.

All-matmul formulation with **zero dynamic shifts** in the kernel: the
per-(template, channel) integer moveout is folded host-side into extended
correlation filters of length LM = L + max_moveout —

  F[t, c, mv + j] = (w[t,c] / ||tpl||) * tpl_dm[t, c, j]

so that for output lag b,

  corr_w[t, b] = sum_i F[t, c, i] * d[c, b + i]    (moveout-aligned,
                                                    weight-folded)

The per-window normalization 1/||window|| does NOT need per-template
matmuls: the sliding sums r1(p) = sum_{j<L} d[p+j] and r2(p) = sum d^2 are
per-channel functions of position only, computed once per block for ALL
channels with O(log L) shift-doubling adds (pltpu.roll at static shifts),
giving y(p) = rsqrt(r2 - r1^2/L).  Each template then needs y at p = b + mv,
which is a one-hot moveout-select matmul against a 128-row Hankel of y.
This costs n_k + Q matmul tap-blocks per channel instead of the 3*n_k of
the naive [corr; window-sum; square-sum] formulation (Q = max_moveout/128+1,
usually 1-2), a ~1.5-2.3x MAC reduction.

The sliding windows come from a 128-row Hankel H128[r, :] = d[c, r : r + W]
built with 128 *static* shifted copies (Mosaic handles constant lane offsets
natively); every filter tap block then reads H128 at 128-aligned column
offsets, so the contraction is a sum of (n_tp, 128) x (128, B) MXU matmuls.
Out-of-bounds lags are masked per (template, channel) from host-precomputed
bounds.  Filters stay resident in VMEM; data blocks stream by DMA.

Replaces the external `fast_matched_filter` package (reference call sites
BPMF/similarity_search.py:526-533).  Semantics match
`ops.reference.matched_filter(network_sum=True)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi = round-to-nearest-even bf16 of x,
    computed via integer bit arithmetic (a plain f32->bf16->f32 convert
    round-trip would be folded to identity by XLA's excess-precision pass,
    silently zeroing the lo component).  |x - hi - lo| <= 2^-18 |x|.
    Finite inputs only."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    hi = jax.lax.bitcast_convert_type(
        rounded & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _sliding_sum(x, L: int, W: int):
    """Window sums s[p] = sum_{j<L} x[:, p+j] via shift-doubling.

    O(log L) adds of full rows at static cyclic rolls; entries with
    p > W - L wrap around and are garbage (always masked downstream).
    """
    if L == 1:
        return x
    bits = [b for b in range(L.bit_length()) if (L >> b) & 1]
    pow_sums = {}
    s, w = x, 1
    for _ in range(bits[-1] + 1):
        pow_sums[w] = s
        if 2 * w <= (1 << bits[-1]):
            s = s + pltpu.roll(s, W - w, 1)
            w *= 2
    out, off = None, 0
    for b in reversed(bits):
        term = pow_sums[1 << b]
        t = term if off == 0 else pltpu.roll(term, W - off, 1)
        out = t if out is None else out + t
        off += 1 << b
    return out


def _gather_ysel(ysel_scratch, yhank_scratch, mv_ref, c, n_tp_pad: int,
                 B: int):
    """Normalization moveout-select as a per-template dynamic slice:
    ysel[t, :] = y[c, mv[c, t] : mv[c, t] + B].

    The one-hot select matmul is a gather in disguise — each template picks
    ONE lane offset of the per-channel rsqrt-variance row.  Expressing it as
    n_tp dynamic (1, B) VMEM slices replaces Q matmul tap-blocks per channel
    (2 MXU passes each in the 'high' ladder, 6 at HIGHEST) with pure vector
    copies, and the selected values are EXACT f32 (no bf16 split needed).

    Mosaic only lowers dynamic LANE offsets it can prove 128-aligned, so
    the gather reads the channel's y Hankel (`yhank_scratch[r, col] =
    y[col + 127 - r]`, the same roll the matmul path builds): the sub-block
    part of the moveout selects the ROW (dynamic sublane offsets are
    unrestricted) and the lane offset `mv - mv % 128` carries a
    `pl.multiple_of` alignment proof."""

    def t_body(t, carry):
        mv = mv_ref[c, t]
        r = jax.lax.rem(mv, 128)
        kofs = pl.multiple_of(mv - r, 128)
        ysel_scratch[pl.ds(t, 1), :] = yhank_scratch[
            pl.ds(127 - r, 1), pl.ds(kofs, B)
        ]
        return carry

    jax.lax.fori_loop(0, n_tp_pad, t_body, 0)


def _mf_kernel(
    base_ref,    # (1, 1) f32 (SMEM): absolute lag of this shard's first lag
    kb_ref,      # (n_ch, 4) int32 (SMEM): per-channel live tap-block bounds
                 #  [klo, khi) for the corr sweep, [qlo, qhi) for the
                 #  normalization select — blocks outside a channel's
                 #  moveout span hold all-zero filter rows and are skipped
    mv_ref,      # (n_ch, n_tp_pad) int32 (SMEM): per-(channel, template)
                 #  moveout (pad_left-folded; only read in gather mode)
    filt_ref,    # (n_ch, n_tp_pad, LM_pad) f32 corr filters (weight-folded,
                 #  REVERSED within each 128-tap block for the G127 layout)
    sel_ref,     # (n_ch, n_tp_pad, Q*128) f32 one-hot at the moveout
                 #  (block-reversed likewise; (1, 1) SMEM dummy in gather
                 #  mode, where the select is a dynamic slice instead)
    hi_ref,      # (n_ch, n_tp_pad) f32 upper lane bound (abs units)
    lo_ref,      # (n_ch, n_tp_pad) f32 lower lane bound
    data_ref,    # (n_ch_pad, ext) f32 (ANY/HBM)
    out_ref,     # (n_tp_pad, B) f32 block
    *scratches,  # (win, y, [acc,] [ysel,] dma_sem)
                 # (acc only in the predicated, non-dense variant; ysel in
                 #  the predicated variant and in gather mode)
    L: int,
    LM_pad: int,
    B: int,
    n_ch: int,
    n_tp_pad: int,
    Q: int,
    inv_l: float,
    precision=jax.lax.Precision.HIGHEST,
    dense: bool = False,
    gather: bool = False,
    diag: str = "",
):
    win_scratch, y_scratch = scratches[:2]
    idx = 2
    if not dense:
        acc_scratch = scratches[idx]
        idx += 1
    if not dense or gather:
        ysel_scratch = scratches[idx]
        idx += 1
    if gather:
        yhank_scratch = scratches[idx]
        idx += 1
    dma_sem = scratches[idx]
    g = pl.program_id(0)
    ofs = g * B
    W = B + LM_pad
    n_k = LM_pad // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(
        jnp.float32
    )

    dma = pltpu.make_async_copy(
        data_ref.at[:, pl.ds(ofs, W)],
        win_scratch,
        dma_sem,
    )
    dma.start()
    dma.wait()

    # per-position normalization for ALL channels at once (VPU, O(log L)):
    # y(p) = rsqrt(r2 - r1^2/L) with r1/r2 the L-sample sliding sums
    d = win_scratch[...]
    if diag == "nonorm":  # diagnostic: skip the sliding sums (wrong CC)
        y = jnp.ones_like(d)
    else:
        r1 = _sliding_sum(d, L, W)
        r2 = _sliding_sum(d * d, L, W)
        var_l = r2 - r1 * r1 * inv_l
        y = jnp.where(
            var_l > 1e-10, jax.lax.rsqrt(jnp.abs(var_l) + 1e-30), 0.0
        )
    y_scratch[...] = y

    def hankel(row, width):
        # H[r, col] = row[col + 127 - r]: the whole 128-shift Hankel of a
        # row built with ONE strided roll (vs 128 per-row copies); the
        # filter blocks are reversed host-side so the contraction reads
        # aligned column blocks
        h = jnp.broadcast_to(row, (128, width))
        if diag == "noroll":  # diagnostic: measure the roll cost
            return h
        return pltpu.roll(h, width - 127, 1, stride=1, stride_axis=0)

    def channel_body(c, acc):
        g127 = hankel(win_scratch[pl.ds(c, 1), :], W)
        if gather:
            y127, yofs = None, 0
            if diag != "noysel":
                yhank_scratch[...] = hankel(y_scratch[pl.ds(c, 1), :], W)
                _gather_ysel(ysel_scratch, yhank_scratch, mv_ref, c,
                             n_tp_pad, B)
        else:
            y127, yofs = hankel(y_scratch[pl.ds(c, 1), :], W), 0

        # k loops unrolled at trace time (~10x faster Mosaic compiles,
        # pipelined matmuls) and predicated per channel: only the tap
        # blocks inside this channel's moveout span carry nonzero rows
        dn = (((1,), (0,)), ((), ()))
        mm = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if dense:
            corr, ysel = None, None
            if diag != "nocorr":
                for k in range(n_k):
                    term = mm(filt_ref[c, :, 128 * k : 128 * (k + 1)],
                              g127[:, 128 * k : 128 * k + B])
                    corr = term if corr is None else corr + term
            if diag != "noysel":
                if gather:
                    ysel = ysel_scratch[...]
                else:
                    for q in range(Q):
                        term = mm(
                            sel_ref[c, :, 128 * q : 128 * (q + 1)],
                            y127[:, yofs + 128 * q : yofs + 128 * q + B],
                        )
                        ysel = term if ysel is None else ysel + term
            if corr is None:
                ccn = ysel
            elif ysel is None:
                ccn = corr
            else:
                ccn = corr * ysel
        else:
            klo, khi = kb_ref[c, 0], kb_ref[c, 1]
            qlo, qhi = kb_ref[c, 2], kb_ref[c, 3]
            acc_scratch[...] = jnp.zeros((n_tp_pad, B), jnp.float32)
            if not gather:
                ysel_scratch[...] = jnp.zeros((n_tp_pad, B), jnp.float32)
            if diag != "nocorr":
                for k in range(n_k):
                    @pl.when((k >= klo) & (k < khi))
                    def _(k=k):
                        fo = filt_ref[c, :, 128 * k : 128 * (k + 1)]
                        hk = g127[:, 128 * k : 128 * k + B]
                        acc_scratch[...] = acc_scratch[...] + mm(fo, hk)
            if diag != "noysel" and not gather:
                for q in range(Q):
                    @pl.when((q >= qlo) & (q < qhi))
                    def _(q=q):
                        sq = sel_ref[c, :, 128 * q : 128 * (q + 1)]
                        yq = y127[:, yofs + 128 * q : yofs + 128 * q + B]
                        ysel_scratch[...] = ysel_scratch[...] + mm(sq, yq)
            if diag == "nocorr":
                ccn = ysel_scratch[...]
            elif diag == "noysel":
                ccn = acc_scratch[...]
            else:
                ccn = acc_scratch[...] * ysel_scratch[...]
        if diag == "nomask":  # diagnostic: skip the OOB mask
            return acc + ccn
        # per-(t, c) out-of-bounds mask: lane + ofs within [lo, hi]
        hi_col = jnp.transpose(hi_ref[pl.ds(c, 1), :])  # (n_tp_pad, 1)
        lo_col = jnp.transpose(lo_ref[pl.ds(c, 1), :])
        pos = lane + jnp.float32(ofs) + base_ref[0, 0]  # (1, B)
        mask = (pos <= hi_col) & (pos >= lo_col)
        return acc + jnp.where(mask, ccn, 0.0)

    acc0 = jnp.zeros((n_tp_pad, B), jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, n_ch, channel_body, acc0)


def _mf_kernel_split(
    base_ref,    # (1, 1) f32 (SMEM)
    kb_ref,      # (n_ch, 4) int32 (SMEM)
    mv_ref,      # (n_ch, n_tp_pad) int32 (SMEM; gather mode only)
    fh_ref,      # (n_ch, n_tp_pad, LM_pad) bf16: hi component of the
                 #  weight-folded corr filters (block-reversed)
    fl_ref,      # (n_ch, n_tp_pad, LM_pad) bf16: lo residual component
    sel_ref,     # (n_ch, n_tp_pad, Q*128) bf16 one-hot (exact in bf16;
                 #  (1, 1) SMEM dummy in gather mode)
    hi_ref,      # (n_ch, n_tp_pad) f32
    lo_ref,      # (n_ch, n_tp_pad) f32
    data_ref,    # (n_ch_pad, ext) f32 (ANY/HBM)
    out_ref,     # (n_tp_pad, B) f32 block
    *scratches,  # (win, y, [acc,] [ysel,] [yhank,] dma_sem)
                 # (acc only in the predicated, non-dense variant; ysel /
                 #  yhank only in gather mode)
    L: int,
    LM_pad: int,
    B: int,
    n_ch: int,
    n_tp_pad: int,
    Q: int,
    inv_l: float,
    dense: bool = False,
    gather: bool = False,
    diag: str = "",
):
    """Precision-ladder ("high") variant of `_mf_kernel`: every f32 operand
    is split into two bf16 components (x = x_hi + x_lo, |x_lo| <= 2^-9|x|)
    and the f32 matmuls become DEFAULT-precision bf16 passes —

      corr  = F_hi*D_hi + F_hi*D_lo + F_lo*D_hi   (3 passes vs HIGHEST's 6;
                                                   dropped F_lo*D_lo ~ 2^-18)
      ysel  = sel*y_hi + sel*y_lo                 (sel is 0/1, exact in
                                                   bf16: selection is exact
                                                   to the 2^-18 split)

    Absolute CC error vs the f32 oracle is ~1e-6 (measured; HIGHEST is
    ~3e-7) at ~2.3x fewer MXU passes.  Reference semantics preserved:
    BPMF/similarity_search.py:526-546.

    `dense=True` drops the per-tap-block `pl.when` predication and the two
    (n_tp_pad, B) accumulator scratches: every block's contribution is
    summed functionally (dead blocks hold all-zero filter/select rows, so
    they contribute exactly 0).  For banks whose live-block fraction is
    high (moveout span ~ the whole LM range, the usual production case)
    this removes the scratch zero/read/write VPU traffic per channel at no
    extra MXU work; for tightly clustered banks the predicated variant
    skips real work and stays preferable.  Hardware stage attribution
    (v5e, 128 templates x 30 ch x 1 day, B=8192): corr matmuls ~55% of
    wall at ~92% of MXU bf16 peak, ysel matmuls ~31% at ~87%, rolls/loop
    ~14%, sliding sums and the OOB mask unmeasurably small — the kernel
    is MXU-bound, so variants that only reduce VPU work (fused rolls,
    packed splits) cannot win and were removed after hardware sweeps.
    """
    win_scratch, y_scratch = scratches[:2]
    idx = 2
    if not dense:
        acc_scratch = scratches[idx]
        idx += 1
    if not dense or gather:
        ysel_scratch = scratches[idx]
        idx += 1
    if gather:
        yhank_scratch = scratches[idx]
        idx += 1
    dma_sem = scratches[idx]
    g = pl.program_id(0)
    ofs = g * B
    W = B + LM_pad
    n_k = LM_pad // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(
        jnp.float32
    )

    dma = pltpu.make_async_copy(
        data_ref.at[:, pl.ds(ofs, W)],
        win_scratch,
        dma_sem,
    )
    dma.start()
    dma.wait()

    d = win_scratch[...]
    if diag == "nonorm":  # diagnostic: skip the sliding sums (wrong CC)
        y = jnp.ones_like(d)
    else:
        r1 = _sliding_sum(d, L, W)
        r2 = _sliding_sum(d * d, L, W)
        var_l = r2 - r1 * r1 * inv_l
        y = jnp.where(
            var_l > 1e-10, jax.lax.rsqrt(jnp.abs(var_l) + 1e-30), 0.0
        )
    y_scratch[...] = y

    def hankel(row, width):
        # H[r, col] = row[col + 127 - r] via one strided roll
        h = jnp.broadcast_to(row, (128, width))
        if diag == "noroll":  # diagnostic: measure the roll cost
            return h
        return pltpu.roll(h, width - 127, 1, stride=1, stride_axis=0)

    def channel_body(c, acc):
        # the Hankels roll in f32 (Mosaic's strided rotate is 32-bit
        # only) and split ONCE per channel into bf16 pairs — the
        # per-tap-block (128, B) slices overlap at 128-lane offsets,
        # so splitting whole rolled Hankels costs
        # ~(W/B)/(n_k_live + Q) of per-slice splitting
        gh, gl = _split_bf16(hankel(win_scratch[pl.ds(c, 1), :], W))
        if gather:
            # the dynamic-slice select reads EXACT f32 y from the rolled
            # Hankel (no bf16 y split), skipping Q*2 MXU passes
            yh = yl = None
            if diag != "noysel":
                yhank_scratch[...] = hankel(y_scratch[pl.ds(c, 1), :], W)
                _gather_ysel(ysel_scratch, yhank_scratch, mv_ref, c,
                             n_tp_pad, B)
        else:
            yh, yl = _split_bf16(hankel(y_scratch[pl.ds(c, 1), :], W))
        yofs = 0

        dn = (((1,), (0,)), ((), ()))
        mm = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        if dense:
            corr, ysel = None, None
            if diag != "nocorr":
                for k in range(n_k):
                    fh = fh_ref[c, :, 128 * k : 128 * (k + 1)]
                    fl = fl_ref[c, :, 128 * k : 128 * (k + 1)]
                    hk = gh[:, 128 * k : 128 * k + B]
                    lk = gl[:, 128 * k : 128 * k + B]
                    term = mm(fh, hk) + mm(fh, lk) + mm(fl, hk)
                    corr = term if corr is None else corr + term
            if diag != "noysel":
                if gather:
                    ysel = ysel_scratch[...]
                else:
                    for q in range(Q):
                        sq = sel_ref[c, :, 128 * q : 128 * (q + 1)]
                        yq = yh[:, yofs + 128 * q : yofs + 128 * q + B]
                        zq = yl[:, yofs + 128 * q : yofs + 128 * q + B]
                        term = mm(sq, yq) + mm(sq, zq)
                        ysel = term if ysel is None else ysel + term
            if corr is None:
                ccn = ysel
            elif ysel is None:
                ccn = corr
            else:
                ccn = corr * ysel
        else:
            klo, khi = kb_ref[c, 0], kb_ref[c, 1]
            qlo, qhi = kb_ref[c, 2], kb_ref[c, 3]
            acc_scratch[...] = jnp.zeros((n_tp_pad, B), jnp.float32)
            if not gather:
                ysel_scratch[...] = jnp.zeros((n_tp_pad, B), jnp.float32)
            if diag != "nocorr":
                for k in range(n_k):
                    @pl.when((k >= klo) & (k < khi))
                    def _(k=k):
                        fh = fh_ref[c, :, 128 * k : 128 * (k + 1)]
                        fl = fl_ref[c, :, 128 * k : 128 * (k + 1)]
                        hk = gh[:, 128 * k : 128 * k + B]
                        lk = gl[:, 128 * k : 128 * k + B]
                        acc_scratch[...] = (
                            acc_scratch[...] + mm(fh, hk) + mm(fh, lk)
                            + mm(fl, hk)
                        )
            if diag != "noysel" and not gather:
                for q in range(Q):
                    @pl.when((q >= qlo) & (q < qhi))
                    def _(q=q):
                        sq = sel_ref[c, :, 128 * q : 128 * (q + 1)]
                        yq = yh[:, yofs + 128 * q : yofs + 128 * q + B]
                        zq = yl[:, yofs + 128 * q : yofs + 128 * q + B]
                        ysel_scratch[...] = (
                            ysel_scratch[...] + mm(sq, yq) + mm(sq, zq)
                        )
            if diag == "nocorr":
                ccn = ysel_scratch[...]
            elif diag == "noysel":
                ccn = acc_scratch[...]
            else:
                ccn = acc_scratch[...] * ysel_scratch[...]
        if diag == "nomask":  # diagnostic: skip the OOB mask
            return acc + ccn
        hi_col = jnp.transpose(hi_ref[pl.ds(c, 1), :])
        lo_col = jnp.transpose(lo_ref[pl.ds(c, 1), :])
        pos = lane + jnp.float32(ofs) + base_ref[0, 0]
        mask = (pos <= hi_col) & (pos >= lo_col)
        return acc + jnp.where(mask, ccn, 0.0)

    acc0 = jnp.zeros((n_tp_pad, B), jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, n_ch, channel_body, acc0)


@functools.partial(
    jax.jit,
    static_argnames=("L", "B", "LM_pad", "n_corr_pad", "n_ch", "Q",
                     "interpret", "dense", "gather", "diag"),
)
def _mf_pallas_call_split(
    fh, fl, sel, hi, lo, data_pad, base=None, kb=None, mv=None,
    *, L, B, LM_pad, n_corr_pad, n_ch, Q=None, interpret=False,
    dense=False, gather=False, diag="",
):
    if base is None:
        base = jnp.zeros((1, 1), jnp.float32)
    n_tp_pad = fh.shape[1]
    if Q is None:
        Q = sel.shape[-1] // 128
    n_k = LM_pad // 128
    if kb is None:
        kb = jnp.tile(
            jnp.asarray([[0, n_k, 0, Q]], jnp.int32), (fh.shape[0], 1)
        )
    if mv is None:
        mv = jnp.zeros((fh.shape[0], n_tp_pad), jnp.int32)
    n_blocks = n_corr_pad // B
    W = B + LM_pad
    n_ch_pad = data_pad.shape[0]
    kernel = functools.partial(
        _mf_kernel_split,
        L=L, LM_pad=LM_pad, B=B, n_ch=n_ch, n_tp_pad=n_tp_pad, Q=Q,
        inv_l=1.0 / L, dense=dense, gather=gather, diag=diag,
    )
    scratch = [
        pltpu.VMEM((n_ch_pad, W), jnp.float32),
        pltpu.VMEM((n_ch_pad, W), jnp.float32),
    ]
    if not dense:
        scratch.append(pltpu.VMEM((n_tp_pad, B), jnp.float32))
    if not dense or gather:
        scratch.append(pltpu.VMEM((n_tp_pad, B), jnp.float32))
    if gather:
        scratch.append(pltpu.VMEM((128, W), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # base
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kb
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fl
            # gather mode never touches sel: a (1, 1) SMEM dummy replaces
            # the one-hot bank (no VMEM residency, no device transfer)
            pl.BlockSpec(memory_space=pltpu.SMEM if gather
                         else pltpu.VMEM),            # sel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lo
            pl.BlockSpec(memory_space=pl.ANY),       # data
        ],
        out_specs=pl.BlockSpec(
            (n_tp_pad, B), lambda g: (0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tp_pad, n_corr_pad), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(base, kb, mv, fh, fl, sel, hi, lo, data_pad)


@functools.partial(
    jax.jit,
    static_argnames=("L", "B", "LM_pad", "n_corr_pad", "n_ch", "Q",
                     "interpret", "precision", "dense", "gather", "diag"),
)
def _mf_pallas_call(
    filt, sel, hi, lo, data_pad, base=None, kb=None, mv=None,
    *, L, B, LM_pad, n_corr_pad, n_ch, Q=None, interpret=False,
    precision=jax.lax.Precision.HIGHEST, dense=False, gather=False,
    diag="",
):
    if base is None:
        base = jnp.zeros((1, 1), jnp.float32)
    n_tp_pad = filt.shape[1]
    if Q is None:
        Q = sel.shape[-1] // 128
    n_k = LM_pad // 128
    if kb is None:
        kb = jnp.tile(
            jnp.asarray([[0, n_k, 0, Q]], jnp.int32), (filt.shape[0], 1)
        )
    if mv is None:
        mv = jnp.zeros((filt.shape[0], n_tp_pad), jnp.int32)
    n_blocks = n_corr_pad // B
    W = B + LM_pad
    kernel = functools.partial(
        _mf_kernel,
        L=L, LM_pad=LM_pad, B=B, n_ch=n_ch, n_tp_pad=n_tp_pad, Q=Q,
        inv_l=1.0 / L, precision=precision, dense=dense, gather=gather,
        diag=diag,
    )
    scratch = [
        pltpu.VMEM((data_pad.shape[0], W), jnp.float32),
        pltpu.VMEM((data_pad.shape[0], W), jnp.float32),
    ]
    if not dense:
        scratch.append(pltpu.VMEM((n_tp_pad, B), jnp.float32))
    if not dense or gather:
        scratch.append(pltpu.VMEM((n_tp_pad, B), jnp.float32))
    if gather:
        scratch.append(pltpu.VMEM((128, W), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # base
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kb
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # filt
            # gather mode never touches sel: a (1, 1) SMEM dummy replaces
            # the one-hot bank (no VMEM residency, no device transfer)
            pl.BlockSpec(memory_space=pltpu.SMEM if gather
                         else pltpu.VMEM),            # sel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lo
            pl.BlockSpec(memory_space=pl.ANY),       # data
        ],
        out_specs=pl.BlockSpec(
            (n_tp_pad, B), lambda g: (0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tp_pad, n_corr_pad), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(base, kb, mv, filt, sel, hi, lo, data_pad)


@functools.partial(jax.jit, static_argnames=("n_ch_pad", "ext", "pad_left"))
def _pad_day_device(data, n_ch_pad: int, ext: int, pad_left: int):
    n_ch, n_samp = data.shape
    hi_clip = min(ext, pad_left + n_samp)
    out = jnp.zeros((n_ch_pad, ext), jnp.float32)
    return jax.lax.dynamic_update_slice(
        out, data[:, : hi_clip - pad_left].astype(jnp.float32),
        (0, pad_left),
    )


def pad_day_data(data, n_ch: int, n_samp: int, pad_left: int,
                 ext: int, dtype: str = "float32") -> jnp.ndarray:
    """Host data (n_sta, n_comp, n_samp) -> padded device layout.

    Uploads the RAW (n_ch, n_samp) array and pads on device: over a
    tunneled accelerator link (~40 MB/s measured) the zero margin would
    otherwise cost extra transfer, and the host-side 278 MB zero+copy is
    skipped entirely.

    `dtype='bfloat16'` halves the transfer again: the day is rounded to
    bf16 on the host, shipped as 2-byte samples, and cast back to f32
    inside the device pad program, so the kernel sees a normal f32
    layout holding bf16-rounded values.  Meant for the `screen`
    campaign path, whose single-pass scan rounds the data to bf16
    anyway and whose detection decisions are re-taken on exact
    host-side CC — only the time-dependent threshold keeps the
    additional ~1e-3 rounding (inside the screen margin)."""
    data = np.ascontiguousarray(
        np.asarray(data, np.float32).reshape(n_ch, n_samp)
    )
    if dtype == "bfloat16":
        import ml_dtypes

        data = data.astype(ml_dtypes.bfloat16)
    return _pad_day_device(
        jnp.asarray(data), n_ch_pad=_round_up(n_ch, 8), ext=int(ext),
        pad_left=int(pad_left),
    )


class PallasMatchedFilterPlan:
    """Device-resident matched-filter plan: filters built and transferred
    once, then applied to any number of (device-resident) data windows.

    Keeping the templates AND the data on device is what makes repeated
    day scans fast — host<->device transfers dominate otherwise.
    """

    def __init__(self, templates, moveouts, weights, n_samp: int,
                 lag_block: int = 8192, interpret: bool = False,
                 precision: str = "highest", pad_left: int = None,
                 max_moveout: int = None, dense: bool = None,
                 ysel: str = None, diag: str = ""):
        # note: template_chunk=256 in callers (round-5 hardware sweep,
        # gather select: 256-row matmuls win ~10% at 'high' and ~20% at
        # bf16 over 128; B=16384+chunk=256 overflows VMEM)
        templates = np.asarray(templates, np.float32)
        moveouts = np.asarray(moveouts, np.int64)
        weights = np.asarray(weights, np.float32)
        n_tp, n_sta, n_comp, L = templates.shape
        n_ch = n_sta * n_comp
        self.n_tp, self.n_ch, self.L = n_tp, n_ch, L
        self.n_samp = n_samp
        self.interpret = interpret
        # diag: stage-removal diagnostics for hardware cost attribution
        # ("noroll"/"nonorm"/"nocorr"/"noysel"/"nomask" — wrong CC values,
        # never for production)
        self.diag = diag
        # 'highest'  = 6-pass f32 MXU (bit-parity with the NumPy oracle,
        #              ~3e-7); 'high' = explicit 2-component bf16 split,
        # 3-pass corr + exact one-hot select (~1e-6, ~2x faster);
        # 'default'  = single bf16 pass (~2e-4, fastest).
        # No XLA-HIGH rung: Mosaic lowers only DEFAULT/HIGHEST inside
        # Pallas; the 3-pass idea is what 'high' implements explicitly.
        if precision not in ("highest", "high", "default"):
            raise ValueError(f"unknown precision {precision!r}")
        self.precision_name = precision
        self.precision = (
            jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        n_corr_unit = n_samp - L + 1

        mv_flat = moveouts.reshape(n_tp, n_ch)
        # pad_left / max_moveout overrides let several template-chunk plans
        # share ONE padded data layout (pad + upload the day once)
        if pad_left is None:
            min_mv = int(min(0, mv_flat.min(initial=0)))
            pad_left = -min_mv
        self.pad_left = pad_left
        mv_flat = mv_flat + pad_left  # >= 0
        max_mv = (int(max_moveout) + pad_left if max_moveout is not None
                  else int(mv_flat.max(initial=0)))

        self.n_tp_pad = n_tp_pad = _round_up(max(n_tp, 8), 8)
        self.B = B = lag_block
        LM_pad = self._lm_pad(L, max_mv)
        self.Q = Q = max_mv // 128 + 1
        self.LM_pad = LM_pad
        self.n_corr_unit = n_corr_unit
        self.n_corr_pad = _round_up(n_corr_unit, B)

        # normalization select: 'gather' replaces the Q one-hot matmul
        # tap-blocks per channel with n_tp dynamic (1, B) VMEM slices of
        # the f32 y row (exact select, no MXU passes, no y Hankel roll,
        # no bf16 y split).  Hardware sweep (scripts/mf_variants.py,
        # v5e, round 5): gather wins every rung with the same oracle
        # parity (err 2.34e-7 vs matmul's 2.90e-7 at high) — 5770 vs
        # 5228 GMAC/s high-dense, 5296 vs 4451 predicated, 9598 vs 9171
        # bf16, 5573 vs 5165 at 1024 templates — so it is the default;
        # 'matmul' remains as the round-4 measured fallback rung.
        if ysel is None:
            ysel = "gather"
        if ysel not in ("matmul", "gather"):
            raise ValueError(f"unknown ysel {ysel!r}")
        self.ysel = ysel
        if ysel == "gather" and int(mv_flat.max(initial=0)) > max_mv:
            # fail loud like the matmul path (whose one-hot/filter build
            # raises on out-of-range offsets): a silently clamped
            # mv_table row would gather the wrong normalization window
            raise ValueError(
                f"max_moveout override {max_mv - pad_left} is smaller "
                f"than the bank's actual max moveout "
                f"{int(mv_flat.max(initial=0)) - pad_left} "
                f"(ysel='gather' cannot clamp)"
            )
        if int(mv_flat.min(initial=0)) < 0:
            # min side, BOTH modes: a pad_left override smaller than
            # -moveouts.min() would wrap the filter placement
            # (np.put_along_axis wraps negative indices) and clamp the
            # gather table to 0 — silently wrong either way
            raise ValueError(
                f"pad_left override {pad_left} does not cover the "
                f"bank's most-negative moveout "
                f"{int(mv_flat.min(initial=0)) - pad_left}"
            )

        tp_flat = templates.reshape(n_tp, n_ch, L)
        tp_dm = tp_flat - tp_flat.mean(axis=-1, keepdims=True)
        x_norm = np.sqrt((tp_dm.astype(np.float64) ** 2).sum(-1)).astype(
            np.float32
        )
        w_flat = weights.reshape(n_tp, n_ch)
        scale = np.where(x_norm > 0, w_flat / np.maximum(x_norm, 1e-30), 0.0)

        # vectorized banded filter build: place the demeaned, weight-scaled
        # template rows at offset mv; the one-hot `sel` picks the channel's
        # precomputed rsqrt(var) row at the same offset
        filt = np.zeros((n_tp, n_ch, LM_pad), np.float32)
        idx = mv_flat[:, :, None] + np.arange(L)[None, None, :]
        np.put_along_axis(filt, idx, tp_dm * scale[:, :, None], axis=-1)
        if ysel == "matmul":
            sel = np.zeros((n_tp, n_ch, Q * 128), np.float32)
            np.put_along_axis(
                sel, mv_flat[:, :, None],
                (scale > 0)[:, :, None].astype(np.float32), axis=-1,
            )
            sel = np.ascontiguousarray(np.transpose(sel, (1, 0, 2)))
        filt = np.ascontiguousarray(np.transpose(filt, (1, 0, 2)))
        if n_tp_pad > n_tp:
            pad = ((0, 0), (0, n_tp_pad - n_tp), (0, 0))
            filt = np.pad(filt, pad)
            if ysel == "matmul":
                sel = np.pad(sel, pad)
        # reverse each 128-tap block for the kernel's G127 Hankel layout
        # (G127[r, col] = d[col + 127 - r])
        filt = np.ascontiguousarray(
            filt.reshape(n_ch, n_tp_pad, -1, 128)[..., ::-1]
        ).reshape(n_ch, n_tp_pad, LM_pad)
        if ysel == "matmul":
            sel = np.ascontiguousarray(
                sel.reshape(n_ch, n_tp_pad, -1, 128)[..., ::-1]
            ).reshape(n_ch, n_tp_pad, Q * 128)

        # per-channel live tap-block bounds: k blocks outside the channel's
        # moveout span hold all-zero filter rows and are skipped in-kernel
        n_k = LM_pad // 128
        masked = np.where(scale > 0, mv_flat, np.int64(np.iinfo(np.int32).max))
        mv_lo_c = masked.min(axis=0)  # (n_ch,)
        masked_hi = np.where(scale > 0, mv_flat, -1)
        mv_hi_c = masked_hi.max(axis=0)
        empty_c = ~(scale > 0).any(axis=0)
        mv_lo_c = np.where(empty_c, 0, mv_lo_c)
        mv_hi_c = np.where(empty_c, -1, mv_hi_c)
        kb = np.zeros((n_ch, 4), np.int32)
        kb[:, 0] = np.clip(mv_lo_c // 128, 0, n_k)
        kb[:, 1] = np.clip((mv_hi_c + L - 1) // 128 + 1, 0, n_k)
        kb[:, 2] = np.clip(mv_lo_c // 128, 0, Q)
        kb[:, 3] = np.clip(mv_hi_c // 128 + 1, 0, Q)
        kb[empty_c] = 0
        self.kb = jnp.asarray(kb)
        # when most tap blocks are live anyway, the unpredicated dense
        # kernel (functional accumulation, no accumulator scratch
        # zero/read/write per channel) wins: hardware-measured +16%
        # (5.2 vs 4.45 TMAC/s on v5e, 128 templates x 1 day, B=8192),
        # parity-gated on hardware at both precisions
        # (scripts/validate_dense.py, bench.py --check).  Tightly
        # clustered banks keep the predicated skip, which drops real
        # MXU work.  Default = live-block-fraction heuristic.
        if dense is None:
            live = float(
                np.clip(kb[:, 1] - kb[:, 0], 0, None).sum()
                + np.clip(kb[:, 3] - kb[:, 2], 0, None).sum()
            )
            total = float(n_ch * (n_k + Q))
            dense = total > 0 and live / total >= 0.75
        self.dense = bool(dense)
        # per-(channel, template) moveout table for the gather (SMEM);
        # padded/dead rows stay 0 — their corr rows are all-zero and
        # the hi/lo lag mask removes them, so any in-bounds y is fine
        # (gather mode raised above if any moveout exceeds max_mv)
        mv_t = np.zeros((n_ch, n_tp_pad), np.int32)
        mv_t[:, :n_tp] = np.clip(mv_flat, 0, max_mv).T
        self.mv_table = jnp.asarray(mv_t)

        n_samp_eff = n_samp + pad_left
        hi = (n_samp_eff - L - mv_flat).astype(np.float32)
        lo = (pad_left - mv_flat).astype(np.float32)
        hi_in = np.full((n_ch, n_tp_pad), -1.0, np.float32)
        lo_in = np.zeros((n_ch, n_tp_pad), np.float32)
        hi_in[:, :n_tp] = hi.T
        lo_in[:, :n_tp] = lo.T

        if self.ysel == "gather":
            # the one-hot bank is never read: a (1, 1) SMEM dummy saves
            # its VMEM residency AND its device transfer
            sel_dev = jnp.zeros((1, 1), jnp.float32)
        if precision == "high":
            fh = filt.astype(np.float32).astype(jnp.bfloat16)
            fl = (filt - np.asarray(fh, np.float32)).astype(jnp.bfloat16)
            self.filt_hi = jnp.asarray(fh)
            self.filt_lo = jnp.asarray(fl)
            self.sel = (sel_dev if self.ysel == "gather"
                        else jnp.asarray(sel.astype(jnp.bfloat16)))
        else:
            self.filt = jnp.asarray(filt)
            self.sel = (sel_dev if self.ysel == "gather"
                        else jnp.asarray(sel))
        self.hi = jnp.asarray(hi_in)
        self.lo = jnp.asarray(lo_in)

    @property
    def ext(self) -> int:
        return self.n_corr_pad + self.LM_pad

    @staticmethod
    def _lm_pad(L: int, max_mv: int) -> int:
        """Tap-axis padded length shared by the filter build and the data
        layout (`max_mv` already includes `pad_left`)."""
        LM_pad = _round_up(L + max_mv, 128)
        Q = max_mv // 128 + 1
        if 128 * Q > LM_pad:  # short templates: keep the y-Hankel in range
            LM_pad += 128
        return LM_pad

    @classmethod
    def data_layout(
        cls, n_samp: int, L: int, pad_left: int, max_moveout: int,
        lag_block: int = 8192,
    ) -> tuple:
        """(pad_left, ext) of the padded data layout a plan built with the
        same (n_samp, L, pad_left, max_moveout, lag_block) will consume —
        lets a prefetch thread pad + upload a day BEFORE any plan exists."""
        max_mv = int(max_moveout) + int(pad_left)
        LM_pad = cls._lm_pad(int(L), max_mv)
        n_corr_pad = _round_up(int(n_samp) - int(L) + 1, int(lag_block))
        return int(pad_left), n_corr_pad + LM_pad

    def pad_data(self, data, dtype: str = "float32") -> jnp.ndarray:
        """Host data (n_sta, n_comp, n_samp) -> padded device layout.
        `dtype='bfloat16'` halves the host->device transfer (see
        `pad_day_data`); the result is f32 either way."""
        return pad_day_data(data, self.n_ch, self.n_samp, self.pad_left,
                            self.ext, dtype=dtype)

    def __call__(self, data_pad: jnp.ndarray) -> jnp.ndarray:
        """(padded, device-resident) data -> (n_tp, n_corr) device CC."""
        gather = self.ysel == "gather"
        if self.precision_name == "high":
            out = _mf_pallas_call_split(
                self.filt_hi, self.filt_lo, self.sel, self.hi, self.lo,
                data_pad, kb=self.kb, mv=self.mv_table,
                L=self.L, B=self.B, LM_pad=self.LM_pad,
                n_corr_pad=self.n_corr_pad, n_ch=self.n_ch, Q=self.Q,
                interpret=self.interpret,
                dense=self.dense, gather=gather, diag=self.diag,
            )
        else:
            out = _mf_pallas_call(
                self.filt, self.sel, self.hi, self.lo, data_pad,
                kb=self.kb, mv=self.mv_table,
                L=self.L, B=self.B, LM_pad=self.LM_pad,
                n_corr_pad=self.n_corr_pad, n_ch=self.n_ch, Q=self.Q,
                interpret=self.interpret, precision=self.precision,
                dense=self.dense, gather=gather, diag=self.diag,
            )
        return out[: self.n_tp, : self.n_corr_unit]


def matched_filter_pallas(
    templates,
    moveouts,
    weights,
    data,
    step: int = 1,
    lag_block: int = 8192,
    template_chunk: int = 256,
    interpret: bool = False,
    precision: str = "highest",
):
    """Network-summed normalized CC via the fused all-matmul Pallas kernel.

    Same semantics as `ops.reference.matched_filter(network_sum=True)`.
    Template banks larger than `template_chunk` are processed in chunks to
    bound the VMEM-resident filter size.  For repeated scans build a
    `PallasMatchedFilterPlan` once and keep the data device-resident.
    """
    templates = np.asarray(templates, np.float32)
    moveouts = np.asarray(moveouts, np.int64)
    weights = np.asarray(weights, np.float32)
    data = np.asarray(data, np.float32)

    n_tp = templates.shape[0]
    n_samp = data.shape[-1]
    outs = []
    for i in range(0, n_tp, template_chunk):
        plan = PallasMatchedFilterPlan(
            templates[i : i + template_chunk],
            moveouts[i : i + template_chunk],
            weights[i : i + template_chunk],
            n_samp, lag_block=lag_block, interpret=interpret,
            precision=precision,
        )
        outs.append(plan(plan.pad_data(data)))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if step > 1:
        L = templates.shape[-1]
        out = out[:, ::step][:, : (n_samp - L) // step + 1]
    return out
