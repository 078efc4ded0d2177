"""Time-dependent detection thresholds (device implementations).

Replaces BPMF/libc.c:516-673 (OpenMP 'rms' kernel), the 'mad' numpy variant
(BPMF/similarity_search.py:1079-1113) and the BP median+MAD interpolated
threshold (BPMF/template_search.py:1418-1487).

The sliding statistics run as XLA `reduce_window` ops; the reference's quirky
"delay-the-jump" smoothing is a tiny sequential pass over a few hundred
window values and runs as a `lax.scan`.  The zero-filling with a cyclic
500-sample Gaussian table is reproduced exactly (seeded table provided by the
caller for determinism/parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .reference import GAUSSIAN_SAMPLE_LEN


def _window_sums(x, win, shift):
    """Sums of x over windows [i*shift, i*shift + win).

    Implemented as a strided ones-kernel convolution: TPU lowers
    `lax.reduce_window` with large windows into a scoped-memory-hungry
    scalar loop, whereas the conv hits the MXU/VPU windowed-reduction path.
    """
    out = jax.lax.conv_general_dilated(
        x[None, None, :],
        jnp.ones((1, 1, win), jnp.float32),
        window_strides=(shift,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("win", "shift", "n_win"))
def _tdt_rms_kernel(ts, gauss, num_dev, *, win, shift, n_win):
    n = ts.shape[0]
    # global center/dev over non-zero samples of the first (n // win) windows
    n_glob = (n // win) * win
    head = ts[:n_glob]
    nz = head != 0.0
    n_nz = jnp.maximum(jnp.sum(nz), 1)
    center = jnp.sum(jnp.where(nz, head, 0.0)) / n_nz
    dev = jnp.sqrt(
        jnp.sum(jnp.where(nz, (head - center) ** 2, 0.0)) / n_nz
    )

    # fill zeros with cyclic scaled Gaussian noise
    idx = jnp.arange(n, dtype=jnp.int32) % GAUSSIAN_SAMPLE_LEN
    fill = center + gauss[idx] * dev
    ts = jnp.where(ts == 0.0, fill, ts)

    # sliding mean + num_dev * std over n_win windows at stride `shift`
    n_need = (n_win - 1) * shift + win
    ts_w = ts[:n_need]
    s1 = _window_sums(ts_w, win, shift)[:n_win]
    s2 = _window_sums(ts_w * ts_w, win, shift)[:n_win]
    mean = s1 / win
    var = jnp.maximum(s2 / win - mean * mean, 0.0)
    thr_win = mean + num_dev * jnp.sqrt(var)

    # "delay the jump" conservative smoothing.  The reference's two
    # sequential passes over (value, diff) pairs (libc.c:631-651) are
    # algebraically a pair of pairwise maxima:
    #   pass 1: new[i]  = max(orig[i], orig[i-1])   (delay downward steps)
    #   pass 2: final[i] = max(new[i], new[i+1])    (anticipate upward steps)
    thr1 = jnp.concatenate(
        [thr_win[:1], jnp.maximum(thr_win[1:], thr_win[:-1])]
    )
    thr2 = jnp.concatenate(
        [jnp.maximum(thr1[:-1], thr1[1:]), thr1[-1:]]
    )

    # step-wise expansion to full length
    i = jnp.arange(n, dtype=jnp.int32)
    j = jnp.clip(i // shift, 0, n_win - 1)
    out = thr2[j]
    out = jnp.where(i < shift, thr2[0], out)
    out = jnp.where(i >= n - shift, thr2[n_win - 1], out)
    return out.astype(jnp.float32)


def time_dependent_threshold(
    time_series,
    sliding_window_samp: int,
    num_dev: float,
    overlap: float = 0.66,
    threshold_type: str = "rms",
    white_noise=None,
):
    """Time-dependent detection threshold on a CC time series (device op).

    Matches `ops.reference.time_dependent_threshold`.
    """
    ts = jnp.asarray(time_series, jnp.float32)
    n = ts.shape[0]
    threshold_type = threshold_type.lower()

    if threshold_type == "rms":
        sliding_window_samp = min(int(sliding_window_samp), int(n))
        half_win = sliding_window_samp // 2
        shift = max(int((1.0 - overlap) * sliding_window_samp), 1)
        win = 2 * half_win
        n_win = (n - (win - shift)) // shift
        if white_noise is None:
            white_noise = np.random.normal(size=GAUSSIAN_SAMPLE_LEN).astype(
                np.float32
            )
        gauss = jnp.asarray(white_noise, jnp.float32)[:GAUSSIAN_SAMPLE_LEN]
        return _tdt_rms_kernel(
            ts, gauss, jnp.float32(num_dev), win=win, shift=shift, n_win=n_win
        )

    if threshold_type == "mad":
        window = min(int(sliding_window_samp), int(n))
        shift = max(int((1.0 - overlap) * window), 1)
        n_win = max(int((n - window) // shift) + 1, 1)
        if white_noise is None:
            # the reference draws one noise sample per zero entry; size for
            # the worst case (all zeros)
            white_noise = np.random.normal(size=int(n)).astype(np.float32)
        return _tdt_mad_kernel(
            ts, jnp.asarray(white_noise, jnp.float32),
            jnp.float32(num_dev), window=window, shift=shift, n_win=n_win,
        )

    raise ValueError(f"threshold_type must be 'rms' or 'mad', got {threshold_type!r}")


@functools.partial(jax.jit, static_argnames=("window", "shift", "n_windows"))
def _bp_threshold_kernel(x, num_dev, *, window, shift, n_windows):
    """Median + num_dev * MAD in strided windows, linearly interpolated.

    Medians over `window`-sample windows are computed with jnp.median on a
    strided window view (materialized per window via gather — n_windows is
    small, ~hundreds per day).
    """
    n = x.shape[0]
    starts = (jnp.arange(1, n_windows + 1) * shift).astype(jnp.int32)
    length = jnp.minimum(n - starts, window)
    # NaN-pad so windows truncated by the data end slice without clamping
    x_pad = jnp.concatenate([x, jnp.full((window,), jnp.nan, x.dtype)])

    def stats(start, leng):
        w = jax.lax.dynamic_slice(x_pad, (start,), (window,))
        mask = jnp.arange(window) < leng
        wm = jnp.where(mask, w, jnp.nan)
        med = jnp.nanmedian(wm)
        mad = jnp.nanmedian(jnp.abs(wm - med))
        return med, mad

    med, mad = jax.vmap(stats)(starts, length)
    # scipy.stats.median_abs_deviation default scale is 1.0 (reference uses it)
    centers = (starts + jnp.minimum(starts + window, n)) / 2.0
    thr = med + num_dev * mad
    # boundary extension (reference adds copies at t=0 and t=n)
    t_knots = jnp.concatenate(
        [jnp.zeros(1), centers.astype(jnp.float32), jnp.full((1,), float(n))]
    )
    v_knots = jnp.concatenate([thr[:1], thr, thr[-1:]])
    t_full = jnp.arange(n, dtype=jnp.float32)
    return jnp.interp(t_full, t_knots, v_knots).astype(jnp.float32)


def bp_detection_threshold(
    maxbeam, window: int, overlap: float = 0.75, num_dev: float = 15.0
):
    """Running median + num_dev*MAD threshold for the max beam (device op).

    Matches `ops.reference.bp_detection_threshold`.
    """
    x = jnp.asarray(maxbeam, jnp.float32)
    window = min(int(window), int(x.shape[0]))
    shift = max(int((1.0 - overlap) * window), 1)
    n_windows = max(int((x.shape[0] - window) // shift) + 1, 1)
    return _bp_threshold_kernel(
        x, jnp.float32(num_dev), window=window, shift=shift, n_windows=n_windows
    )


@functools.partial(jax.jit, static_argnames=("window", "shift", "n_win"))
def _tdt_mad_kernel(ts, noise, num_dev, *, window, shift, n_win):
    """Median + num_dev * MAD threshold (device mirror of
    `ops.reference.time_dependent_threshold(threshold_type='mad')`).

    The k-th zero sample is filled with noise[k] (same mapping as the
    reference's ``white_noise[:n_zeros]``).
    """
    n = ts.shape[0]
    zeros = ts == 0.0
    ts_nan = jnp.where(zeros, jnp.nan, ts)
    default_center = jnp.nanmedian(ts_nan)
    default_dev = jnp.nanmedian(jnp.abs(ts_nan - default_center))
    rank = jnp.cumsum(zeros.astype(jnp.int32)) - 1
    fill = jnp.take(noise, jnp.clip(rank, 0, noise.shape[0] - 1),
                    mode="clip") * default_dev + default_center
    ts = jnp.where(zeros, fill, ts)

    starts = jnp.arange(n_win, dtype=jnp.int32) * shift

    def stats(start):
        w = jax.lax.dynamic_slice(ts, (start,), (window,))
        med = jnp.median(w)
        mad = jnp.median(jnp.abs(w - med))
        return med + num_dev * mad

    thr = jax.vmap(stats)(starts)
    # conservative pairwise maxima (same algebra as the rms path)
    thr = jnp.concatenate([thr[:1], jnp.maximum(thr[1:], thr[:-1])])
    thr = jnp.concatenate([jnp.maximum(thr[:-1], thr[1:]), thr[-1:]])

    half = window // 2
    mid_len = n - window  # len(time) in the reference
    t = jnp.arange(mid_len, dtype=jnp.int32) + half  # absolute sample time
    mid = thr[jnp.minimum(t // shift, n_win - 1)]
    head = jnp.full((half,), mid[0], jnp.float32)
    tail = jnp.full((window - half,), mid[mid_len - 1], jnp.float32)
    return jnp.concatenate([head, mid, tail]).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("win", "shift", "n_win", "k", "k_blocks",
                     "threshold_type"),
)
def _batch_candidates_kernel(ts, gauss, num_dev, caps, margin, *, win,
                             shift, n_win, k, k_blocks,
                             threshold_type="rms"):
    def one(x, cap):
        if threshold_type == "rms":
            thr = _tdt_rms_kernel(
                x, gauss, num_dev, win=win, shift=shift, n_win=n_win
            )
        else:
            thr = _tdt_mad_kernel(
                x, gauss, num_dev, window=win, shift=shift, n_win=n_win
            )
        thr = jnp.minimum(thr, cap)
        return _candidate_extract_two_stage(x, thr, k, k_blocks,
                                            margin=margin)

    return jax.vmap(one)(ts, caps)


L2_SUB = 32        # level-2 narrowing sub-block (samples)
L2_KEEP = 512      # level-2 sub-blocks kept before the final top-k


def _rms_cov_len(n: int, win: int, shift: int, n_win: int) -> int:
    """Length of the block-summed prefix pass: covers every threshold
    window AND every whole `win` block of the global center/dev stats."""
    return max((n_win - 1) * shift + win, (n // win) * win)


@functools.partial(
    jax.jit,
    static_argnames=("win", "shift", "n_win", "k", "k_blocks", "G", "n",
                     "pack"),
)
def _batch_candidates_rms_fused(cc, g_tiled, num_dev, caps, margin, *, win,
                                shift, n_win, k, k_blocks, G, n,
                                pack=False):
    """Natively-batched rms threshold + hierarchical top-k extraction.

    Replaces the vmapped (`_tdt_rms_kernel` + `_candidate_extract_two_stage`)
    composition for the production day-scan shape: the vmap lowering
    materializes the filled series, the full-length expanded threshold and
    the excess series per row (~5 full (n_tp, n) temporaries) and runs a
    whole-series top-k; hardware attribution (scripts/extract_diag.py)
    put that at ~300 ms/day at 128 templates vs ~320 ms for the CC scan
    itself.  This version:

      * computes the window mean/std from G-sample block partial sums,
        G = gcd(win, shift) (exact: windows are whole numbers of blocks),
        so the zero-fill is applied analytically per block
        (fill = center + gauss*dev  =>  filled block sums are linear in
        the block's [sum, sum^2, n_zero, sum_g@zero, sum_g^2@zero]) and
        the filled series is never materialized;
      * keeps the threshold as the (n_win,) window table; the per-sample
        threshold index is arithmetic (i >= n - shift ? n_win-1 :
        min(i//shift, n_win-1)), so the expanded threshold is never
        materialized either — the candidate comparison gathers from the
        table inside the fused compare+count loop;
      * narrows candidates hierarchically (512-sample blocks -> top
        k_blocks by count -> 32-sample sub-blocks -> top L2_KEEP ->
        final top-k over k_blocks*L2_SUB*... ~16 K lags) instead of one
        top-k over 131 K gathered lags;
      * computes the CC kurtosis from raw power sums in the same
        compare pass (no extra full-series passes).

    Exactness contract (same as the two-stage kernel): the returned set
    equals {i: cc[i] > thr[i] - margin} whenever n_above <= k, at most
    k_blocks 512-blocks hold candidates AND at most L2_KEEP 32-sample
    sub-blocks of those blocks do; `blocks_hit` > k_blocks signals the
    caller's exact fallback otherwise (a level-2 overflow reports
    k_blocks + 1 + sub_hit).

    Reference semantics: BPMF/libc.c:516-673 (threshold) +
    BPMF/libc.c:441-485 (selection; the dedup half lives in
    `dedup_detection_indexes`).
    """
    n_tp = cc.shape[0]
    r, s = win // G, shift // G

    # ---- pass 1: G-block partial sums -> window thresholds ----
    # `g_tiled` is the cyclic 500-sample Gaussian fill pre-tiled to n_cov
    # samples on the host (a runtime table gather of n_cov scalars costs
    # tens of ms on TPU; the tiled table uploads once per campaign).
    n_glob = (n // win) * win
    n_cov = _rms_cov_len(n, win, shift, n_win)
    nb1 = n_cov // G
    xh = cc[:, :n_cov].reshape(n_tp, nb1, G)
    g_full = g_tiled[:n_cov].reshape(nb1, G)
    z = xh == 0.0
    b_x = jnp.sum(xh, axis=-1)
    b_x2 = jnp.sum(xh * xh, axis=-1)
    b_z = jnp.sum(z, axis=-1).astype(jnp.float32)
    b_zg = jnp.sum(jnp.where(z, g_full[None], 0.0), axis=-1)
    b_zg2 = jnp.sum(jnp.where(z, g_full[None] * g_full[None], 0.0), axis=-1)

    kg = n_glob // G
    n_nz = jnp.maximum(
        jnp.float32(n_glob) - jnp.sum(b_z[:, :kg], axis=1), 1.0
    )
    center = jnp.sum(b_x[:, :kg], axis=1) / n_nz
    dev = jnp.sqrt(jnp.maximum(
        jnp.sum(b_x2[:, :kg], axis=1) / n_nz - center * center, 0.0
    ))
    c, d = center[:, None], dev[:, None]

    # filled-series block sums (fill = center + gauss * dev at zeros)
    fb1 = b_x + c * b_z + d * b_zg
    fb2 = b_x2 + c * c * b_z + 2.0 * c * d * b_zg + d * d * b_zg2

    # window sums over whole blocks: window i = blocks [i*s, i*s + r)
    wsel = (
        jnp.arange(n_win, dtype=jnp.int32)[:, None] * s
        + jnp.arange(r, dtype=jnp.int32)[None, :]
    )  # (n_win, r) constant
    s1 = jnp.sum(fb1[:, wsel], axis=-1)
    s2 = jnp.sum(fb2[:, wsel], axis=-1)
    mean = s1 / win
    var = jnp.maximum(s2 / win - mean * mean, 0.0)
    thr_w = mean + num_dev * jnp.sqrt(var)

    # "delay the jump" pairwise maxima (same algebra as _tdt_rms_kernel)
    thr1 = jnp.concatenate(
        [thr_w[:, :1], jnp.maximum(thr_w[:, 1:], thr_w[:, :-1])], axis=1
    )
    thr2 = jnp.concatenate(
        [jnp.maximum(thr1[:, :-1], thr1[:, 1:]), thr1[:, -1:]], axis=1
    )
    thr2 = jnp.minimum(thr2, caps[:, None])  # per-row absolute CC cap

    def thr_at(i):
        """Threshold-table index for absolute sample positions i (i32)."""
        j = jnp.minimum(i // shift, n_win - 1)
        return jnp.where(i >= n - shift, n_win - 1, j)

    # ---- pass 2: fused compare + count + moments over 512-blocks ----
    Bc = CANDIDATE_BLOCK
    nbc = -(-n // Bc)
    pad = nbc * Bc - n
    ccp = jnp.pad(cc, ((0, 0), (0, pad)))
    xb = ccp.reshape(n_tp, nbc, Bc)
    ib = (
        jnp.arange(nbc, dtype=jnp.int32)[:, None] * Bc
        + jnp.arange(Bc, dtype=jnp.int32)[None, :]
    )  # (nbc, Bc) constant absolute positions
    valid = ib < n
    jb = thr_at(ib)  # (nbc, Bc) constant
    thr_b = jnp.take(thr2, jb, axis=1)  # (n_tp, nbc, Bc) gather
    excess = jnp.where(valid[None], xb - thr_b + margin, -jnp.inf)
    pos = excess > 0.0
    counts = jnp.sum(pos, axis=-1)          # (n_tp, nbc)
    n_above = jnp.sum(counts, axis=-1)
    blocks_hit = jnp.sum(counts > 0, axis=-1)

    # raw power sums for the kurtosis (over the true n samples; pad = 0
    # contributes nothing to sums, count uses the static n)
    xv = jnp.where(valid[None], xb, 0.0)
    x2 = xv * xv
    m1 = jnp.sum(xv, axis=(1, 2))
    m2r = jnp.sum(x2, axis=(1, 2))
    m3r = jnp.sum(x2 * xv, axis=(1, 2))
    m4r = jnp.sum(x2 * x2, axis=(1, 2))
    mu = m1 / n
    m2c = jnp.maximum(m2r / n - mu * mu, 0.0)
    m4c = (m4r - 4.0 * mu * m3r + 6.0 * mu * mu * m2r) / n - 3.0 * mu**4
    kurto = jnp.where(m2c > 0, m4c / (m2c * m2c) - 3.0, 0.0)

    # ---- narrowing: top blocks by count -> top sub-blocks -> sort ----
    # Hardware attribution (scripts/fused_diag.py): per-row dynamic
    # gathers at scalar granularity (take_along_axis of the expanded
    # threshold over kb*Bc lags, and of cc/thr at the final k indices)
    # cost ~100 ms+ each on TPU, while the top_k calls and WHOLE-block
    # take_along_axis gathers are nearly free.  So: the selected blocks'
    # thresholds are reconstructed arithmetically (a 512-sample block
    # spans at most one window boundary, so thr takes <= 3 values:
    # table[q], table[q+1] and the tail window), and cc/thr values ride
    # along the block-granular narrowing gathers; the final selection is
    # one multi-operand lax.sort instead of top_k + value gathers.
    kb = min(k_blocks, nbc)
    _, bidx = jax.lax.top_k(counts, kb)      # (n_tp, kb)
    blk_x = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
    i0 = bidx * Bc                            # block-start positions
    qs = i0 // shift                          # window index before clamp
    t_lo = jnp.take_along_axis(thr2, jnp.minimum(qs, n_win - 1), axis=1)
    t_hi = jnp.take_along_axis(thr2, jnp.minimum(qs + 1, n_win - 1), axis=1)
    t_tail = thr2[:, -1][:, None, None]       # tail clause: i >= n - shift
    i_sel = i0[:, :, None] + jnp.arange(Bc, dtype=jnp.int32)
    bnd = ((qs + 1) * shift)[:, :, None]
    thr_sel = jnp.where(
        i_sel >= n - shift, t_tail,
        jnp.where(i_sel >= bnd, t_hi[:, :, None], t_lo[:, :, None]),
    )
    exc_sel = jnp.where(
        i_sel < n, blk_x - thr_sel + margin, -jnp.inf
    )  # (n_tp, kb, Bc)

    n_sub = Bc // L2_SUB
    exc_sub = exc_sel.reshape(n_tp, kb * n_sub, L2_SUB)
    counts2 = jnp.sum(exc_sub > 0.0, axis=-1)  # (n_tp, kb*n_sub)
    sub_hit = jnp.sum(counts2 > 0, axis=-1)
    l2 = min(L2_KEEP, kb * n_sub)
    _, sidx = jax.lax.top_k(counts2, l2)       # (n_tp, l2)

    def _sub_take(a):
        return jnp.take_along_axis(
            a.reshape(n_tp, kb * n_sub, L2_SUB), sidx[:, :, None], axis=1
        ).reshape(n_tp, l2 * L2_SUB)

    exc_l2 = _sub_take(exc_sel)
    cc_l2 = _sub_take(blk_x)
    thr_l2 = _sub_take(thr_sel)
    # global sample index of flat position p in exc_l2 (elementwise from
    # the narrowing indices -- never gathered from a sample-length table)
    base = (
        jnp.take_along_axis(bidx, sidx // n_sub, axis=1) * Bc
        + (sidx % n_sub) * L2_SUB
    )  # (n_tp, l2)
    gidx_l2 = (
        base[:, :, None] + jnp.arange(L2_SUB, dtype=jnp.int32)
    ).reshape(n_tp, l2 * L2_SUB)

    kk = min(k, l2 * L2_SUB)
    _, idx_s, cc_s, thr_s = jax.lax.sort(
        (-exc_l2, gidx_l2, cc_l2, thr_l2), num_keys=1, dimension=-1
    )
    idx = jnp.minimum(idx_s[:, :kk], n - 1)
    cc_v = cc_s[:, :kk]
    thr_v = thr_s[:, :kk]

    # a level-2 overflow invalidates the extraction exactly like a
    # level-1 overflow: report past the caller's k_blocks bound
    blocks_hit = jnp.where(
        sub_hit > l2, jnp.maximum(blocks_hit, k_blocks + 1 + sub_hit),
        blocks_hit,
    )
    if pack:
        # ONE fetchable f32 array [idx | cc | thr | n_above kurto
        # blocks_hit]: a separate np.asarray per output costs a ~25 ms
        # tunnel round trip EACH (~150 ms/day measured); idx/n_above/
        # blocks_hit are < 2^24 so the f32 packing is exact
        aux = jnp.stack(
            [n_above.astype(jnp.float32), kurto,
             blocks_hit.astype(jnp.float32)], axis=1,
        )
        return jnp.concatenate(
            [idx.astype(jnp.float32), cc_v, thr_v, aux], axis=1
        )
    return idx, cc_v, thr_v, n_above, kurto, blocks_hit


class RmsExtractionPlan:
    """Host-precomputed constants for the fused rms threshold + candidate
    extraction: window geometry and the cyclic Gaussian fill pre-tiled to
    the covered length (uploaded once, reused every day of a campaign).

    `extract` is traceable, so a caller can compose it with the CC scan
    into ONE jitted device program (one dispatch per chunk instead of
    two -- the dispatch round trip to a tunneled TPU is ~25 ms).
    """

    def __init__(self, n: int, sliding_window_samp: int,
                 overlap: float = 0.66, white_noise=None,
                 k: int = 1024, k_blocks: int = 256):
        import math

        n = int(n)
        swin = min(int(sliding_window_samp), n)
        half_win = swin // 2
        self.shift = max(int((1.0 - overlap) * swin), 1)
        self.win = 2 * half_win
        self.n_win = ((n - (self.win - self.shift)) // self.shift
                      if self.shift else 0)
        self.n, self.k, self.k_blocks = n, int(k), int(k_blocks)
        # the 3-value threshold select assumes a 512-sample block spans
        # at most one window boundary
        self.supported = (self.n_win >= 1 and self.win > 0
                          and self.shift >= CANDIDATE_BLOCK)
        if white_noise is None:
            white_noise = np.random.normal(
                size=GAUSSIAN_SAMPLE_LEN).astype(np.float32)
        self.white_noise = np.asarray(
            white_noise, np.float32)[:GAUSSIAN_SAMPLE_LEN]
        if self.supported:
            self.G = math.gcd(self.win, self.shift)
            n_cov = _rms_cov_len(n, self.win, self.shift, self.n_win)
            self.g_tiled = jnp.asarray(np.resize(self.white_noise, n_cov))
        else:
            self.G, self.g_tiled = 1, None

    @property
    def can_pack(self) -> bool:
        """True when the single-f32-array packing is exact: candidate
        indices (< n) must be integers below 2^24."""
        return self.n < 2 ** 24

    def extract(self, cc, caps, num_dev, margin=0.0, pack=False):
        """Fused threshold + extraction (traceable).  Returns
        (idx, cc_vals, thr_vals, n_above, kurto, blocks_hit), or with
        ``pack=True`` one (n_tp, 3k+3) f32 array (ONE host fetch; see
        `unpack`)."""
        if pack and not self.can_pack:
            # f32 packing would round indices >= 2^24 (e.g. a >=195 Hz
            # day) to even values — silently wrong candidate lags.
            # Fail loud; callers gate on `can_pack`.
            raise ValueError(
                f"pack=True is exact only for series shorter than 2^24 "
                f"samples (n={self.n}); use pack=False"
            )
        return _batch_candidates_rms_fused(
            cc, self.g_tiled, jnp.float32(num_dev),
            jnp.asarray(caps, jnp.float32), jnp.float32(margin),
            win=self.win, shift=self.shift, n_win=self.n_win, k=self.k,
            k_blocks=self.k_blocks, G=self.G, n=self.n, pack=pack,
        )

    def unpack(self, packed):
        """Host-side inverse of ``extract(pack=True)`` -> the 6-tuple
        (idx, cc_vals, thr_vals, n_above, kurto, blocks_hit) as numpy."""
        a = np.asarray(packed)
        kk = (a.shape[1] - 3) // 3
        return (a[:, :kk].astype(np.int64), a[:, kk:2 * kk],
                a[:, 2 * kk:3 * kk], a[:, 3 * kk].astype(np.int64),
                a[:, 3 * kk + 1], a[:, 3 * kk + 2].astype(np.int64))


_RMS_PLAN_CACHE: dict = {}


def _rms_plan(n, sliding_window_samp, overlap, white_noise, k, k_blocks):
    import zlib

    wn = (np.asarray(white_noise, np.float32)[:GAUSSIAN_SAMPLE_LEN]
          if white_noise is not None else None)
    key = (int(n), int(sliding_window_samp), float(overlap), int(k),
           int(k_blocks),
           zlib.crc32(wn.tobytes()) if wn is not None else None)
    plan = _RMS_PLAN_CACHE.get(key)
    if plan is not None:
        # true LRU: refresh recency on hit so a campaign cycling through
        # several extraction geometries doesn't evict the hot entry
        _RMS_PLAN_CACHE[key] = _RMS_PLAN_CACHE.pop(key)
    else:
        if len(_RMS_PLAN_CACHE) >= 8:
            _RMS_PLAN_CACHE.pop(next(iter(_RMS_PLAN_CACHE)))
        plan = RmsExtractionPlan(n, sliding_window_samp, overlap=overlap,
                                 white_noise=wn, k=k, k_blocks=k_blocks)
        _RMS_PLAN_CACHE[key] = plan
    return plan


def batch_candidates(
    cc,
    caps,
    sliding_window_samp: int,
    num_dev: float,
    overlap: float = 0.66,
    white_noise=None,
    k: int = 1024,
    k_blocks: int = 256,
    threshold_type: str = "rms",
    margin: float = 0.0,
    fused: bool = True,
):
    """Thresholds + top-k candidate extraction for a whole template chunk
    in ONE device program and one host fetch.

    cc : (n_templates, n_corr) device CC stack; caps: per-template absolute
    CC ceiling.  Returns (idx, cc_vals, thr_vals, n_above, kurto,
    blocks_hit), each with a leading template axis.  Semantics per row
    match `time_dependent_threshold(threshold_type=...)` +
    `detect_candidates`, EXACT when `n_above <= k` and
    `blocks_hit <= k_blocks` (the two-stage extraction's validity bounds
    — the caller must fall back per row otherwise).

    `margin` widens the candidate comparison to ``cc > thr - margin``
    (reported `thr_vals` stay the true thresholds): the screen-precision
    engine extracts with a safety margin covering the screened series'
    rounding error, then refines candidates exactly.

    `fused=True` (default) routes the rms path through
    `_batch_candidates_rms_fused`, which never materializes the filled
    series or the expanded threshold (same semantics, fp-rounding-level
    threshold differences); `fused=False` keeps the vmapped
    per-row composition (and is the only path for 'mad').
    """
    ts = jnp.asarray(cc, jnp.float32)
    n = ts.shape[-1]
    threshold_type = threshold_type.lower()
    swin = min(int(sliding_window_samp), int(n))
    if threshold_type == "rms":
        half_win = swin // 2
        shift = max(int((1.0 - overlap) * swin), 1)
        win = 2 * half_win
        n_win = (n - (win - shift)) // shift
        n_noise = GAUSSIAN_SAMPLE_LEN
    else:
        win = swin
        shift = max(int((1.0 - overlap) * win), 1)
        n_win = max(int((n - win) // shift) + 1, 1)
        n_noise = int(n)
    if white_noise is None:
        white_noise = np.random.normal(size=n_noise).astype(np.float32)
    gauss = jnp.asarray(white_noise, jnp.float32)[:n_noise]
    if threshold_type == "rms" and fused:
        plan = _rms_plan(n, sliding_window_samp, overlap, white_noise,
                         k, k_blocks)
        if plan.supported:
            return plan.extract(ts, caps, num_dev, margin)
    return _batch_candidates_kernel(
        ts, gauss, jnp.float32(num_dev),
        jnp.asarray(caps, jnp.float32), jnp.float32(margin),
        win=win, shift=shift, n_win=n_win, k=k, k_blocks=k_blocks,
        threshold_type=threshold_type,
    )


def _cc_kurtosis(cc):
    """4th-moment excess kurtosis of the CC series (sanity check)."""
    mu = jnp.mean(cc)
    d = cc - mu
    m2 = jnp.mean(d * d)
    m4 = jnp.mean(d**4)
    return jnp.where(m2 > 0, m4 / (m2 * m2) - 3.0, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def _candidate_extract_kernel(cc, thr, k: int, margin=0.0):
    """One-stage exact extraction: top-k lags by threshold excess over the
    full series.  Correct for any candidate distribution, but the top_k
    sorts the whole multi-million-sample series."""
    excess = cc - thr + margin
    vals, idx = jax.lax.top_k(excess, k)
    n_above = jnp.sum(excess > 0.0)
    return idx, cc[idx], thr[idx], n_above, _cc_kurtosis(cc)


CANDIDATE_BLOCK = 512


def _candidate_extract_two_stage(cc, thr, k: int, k_blocks: int,
                                 margin=0.0):
    """Two-stage exact extraction: above-threshold samples are rare and
    clustered, so reduce the series into `CANDIDATE_BLOCK`-sample blocks,
    take the `k_blocks` blocks with the most above-threshold samples
    (one O(n) streaming pass + a top_k over n/block elements), and run
    the expensive top_k only on the gathered blocks.  Exact whenever at
    most `k_blocks` blocks contain candidates; `blocks_hit` reports when
    that bound fails so the caller can fall back to the one-stage kernel.

    Returns (idx, cc_vals, thr_vals, n_above, kurto, blocks_hit).
    """
    block = CANDIDATE_BLOCK
    n = cc.shape[0]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    excess = cc - thr + margin
    excess_p = jnp.pad(excess, (0, pad), constant_values=-jnp.inf)
    eb = excess_p.reshape(n_blocks, block)
    counts = jnp.sum(eb > 0.0, axis=-1)
    n_above = jnp.sum(counts)
    blocks_hit = jnp.sum(counts > 0)
    # blocks ordered by candidate count; ties include empty blocks, which
    # contribute nothing (their excess never tops the k selection)
    _, bidx = jax.lax.top_k(counts, min(k_blocks, n_blocks))
    flat = eb[bidx].reshape(-1)
    _, pos = jax.lax.top_k(flat, min(k, flat.shape[0]))
    idx = bidx[pos // block] * block + pos % block
    idx = jnp.minimum(idx, n - 1)  # padded lanes are never above threshold
    return (idx, cc[idx], thr[idx], n_above, _cc_kurtosis(cc),
            blocks_hit)


def detect_candidates(cc, threshold, k: int = 2048, margin: float = 0.0):
    """Device-side detection candidate extraction.

    Computes, on device, the top-k lags by threshold excess and summary
    statistics, so only O(k) values cross to the host instead of the full
    multi-million-sample CC series.  Returns
    (indices (k,), cc values (k,), threshold values (k,), n_above, kurtosis)
    as host arrays/scalars; entries beyond `n_above` are below threshold.
    `margin` widens the comparison to ``cc > thr - margin`` (screen mode).
    """
    cc = jnp.asarray(cc, jnp.float32)
    threshold = jnp.asarray(threshold, jnp.float32)
    k = min(k, cc.shape[0])
    idx, cc_vals, thr_vals, n_above, kurto = _candidate_extract_kernel(
        cc, threshold, k, jnp.float32(margin)
    )
    return (
        np.asarray(idx),
        np.asarray(cc_vals),
        np.asarray(thr_vals),
        int(n_above),
        float(kurto),
    )


def time_dependent_threshold_pd(network_response, window: int,
                                num_dev: float = 15.0) -> np.ndarray:
    """Pandas-rolling variant of the BP detection threshold.

    Trailing-window running median + num_dev * MAD, shifted by one sample
    (each threshold value uses strictly past samples) — the exact
    semantics of the reference's notebook-facing helper
    (BPMF/template_search.py:1490-1517).  Host-side (pandas); for the
    device pipeline use `bp_detection_threshold`.
    """
    import pandas as pd
    from scipy.stats import median_abs_deviation

    s = pd.Series(np.asarray(network_response, np.float64))
    r = s.rolling(window=int(window))
    run_med = r.median().shift(1)
    run_mad = r.apply(median_abs_deviation, raw=True).shift(1)
    return (run_med + num_dev * run_mad).values
