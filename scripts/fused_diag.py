"""Stage attribution INSIDE _batch_candidates_rms_fused on the chip.

Times jitted prefixes of the fused extraction at the production day-scan
shape (128 x 2.16M) to find where the 419 ms goes:

  pass1      block partial sums -> window threshold table
  gather     + per-sample threshold gather (thr_b)
  counts     + excess compare + per-block counts + n_above
  moments    + raw-moment kurtosis
  narrow     + hierarchical top-k narrowing (full kernel)
  vmapped    the old per-row composition, for reference

Run: python scripts/fused_diag.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:>8}: min {min(ts)*1e3:8.1f} ms  "
          f"med {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", file=sys.stderr)
    return min(ts)


def main():
    import functools
    import math

    import jax
    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.thresholds import (
        CANDIDATE_BLOCK, GAUSSIAN_SAMPLE_LEN, L2_KEEP, L2_SUB,
        _batch_candidates_kernel, _batch_candidates_rms_fused,
    )

    rng = np.random.default_rng(0)
    n_tp, n = 128, 2_160_000 - 200 + 1
    cc_h = rng.normal(size=(n_tp, n)).astype(np.float32) * 0.01
    wn = rng.normal(size=500).astype(np.float32)
    caps = jnp.asarray(np.full(n_tp, 0.8, np.float32))
    swin = int(1800.0 * 25.0)
    half_win = swin // 2
    shift = max(int((1.0 - 0.25) * swin), 1)
    win = 2 * half_win
    n_win = (n - (win - shift)) // shift
    G = math.gcd(win, shift)
    gauss = jnp.asarray(wn)
    cc = jnp.asarray(cc_h)
    num_dev = jnp.float32(8.0)
    margin = jnp.float32(0.0)

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:4]

    def pass1_fn(cc, gauss, num_dev, caps):
        r, s = win // G, shift // G
        n_need = (n_win - 1) * shift + win
        n_glob = (n // win) * win
        n_cov = max(n_need, n_glob)
        nb1 = n_cov // G
        xh = cc[:, :n_cov].reshape(n_tp, nb1, G)
        g_full = gauss[
            (jnp.arange(n_cov, dtype=jnp.int32) % GAUSSIAN_SAMPLE_LEN)
        ].reshape(nb1, G)
        z = xh == 0.0
        b_x = jnp.sum(xh, axis=-1)
        b_x2 = jnp.sum(xh * xh, axis=-1)
        b_z = jnp.sum(z, axis=-1).astype(jnp.float32)
        b_zg = jnp.sum(jnp.where(z, g_full[None], 0.0), axis=-1)
        b_zg2 = jnp.sum(jnp.where(z, g_full[None] ** 2, 0.0), axis=-1)
        kg = n_glob // G
        n_nz = jnp.maximum(
            jnp.float32(n_glob) - jnp.sum(b_z[:, :kg], axis=1), 1.0)
        center = jnp.sum(b_x[:, :kg], axis=1) / n_nz
        dev = jnp.sqrt(jnp.maximum(
            jnp.sum(b_x2[:, :kg], axis=1) / n_nz - center * center, 0.0))
        c, d = center[:, None], dev[:, None]
        fb1 = b_x + c * b_z + d * b_zg
        fb2 = b_x2 + c * c * b_z + 2.0 * c * d * b_zg + d * d * b_zg2
        wsel = (jnp.arange(n_win, dtype=jnp.int32)[:, None] * s
                + jnp.arange(r, dtype=jnp.int32)[None, :])
        s1 = jnp.sum(fb1[:, wsel], axis=-1)
        s2 = jnp.sum(fb2[:, wsel], axis=-1)
        mean = s1 / win
        var = jnp.maximum(s2 / win - mean * mean, 0.0)
        thr_w = mean + num_dev * jnp.sqrt(var)
        thr1 = jnp.concatenate(
            [thr_w[:, :1], jnp.maximum(thr_w[:, 1:], thr_w[:, :-1])], axis=1)
        thr2 = jnp.concatenate(
            [jnp.maximum(thr1[:, :-1], thr1[:, 1:]), thr1[:, -1:]], axis=1)
        return jnp.minimum(thr2, caps[:, None])

    def thr_at(i):
        j = jnp.minimum(i // shift, n_win - 1)
        return jnp.where(i >= n - shift, n_win - 1, j)

    Bc = CANDIDATE_BLOCK
    nbc = -(-n // Bc)

    def blocks(cc):
        pad = nbc * Bc - n
        ccp = jnp.pad(cc, ((0, 0), (0, pad)))
        xb = ccp.reshape(n_tp, nbc, Bc)
        ib = (jnp.arange(nbc, dtype=jnp.int32)[:, None] * Bc
              + jnp.arange(Bc, dtype=jnp.int32)[None, :])
        return xb, ib

    def gather_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, ib = blocks(cc)
        thr_b = jnp.take(thr2, thr_at(ib), axis=1)
        return jnp.sum(thr_b, axis=(1, 2))

    def counts_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, ib = blocks(cc)
        thr_b = jnp.take(thr2, thr_at(ib), axis=1)
        excess = jnp.where(ib[None] < n, xb - thr_b + margin, -jnp.inf)
        counts = jnp.sum(excess > 0.0, axis=-1)
        return jnp.sum(counts, axis=-1), jnp.sum(counts > 0, axis=-1)

    def moments_fn(cc, gauss, num_dev, caps):
        na, bh = counts_fn(cc, gauss, num_dev, caps)
        xb, ib = blocks(cc)
        xv = jnp.where(ib[None] < n, xb, 0.0)
        x2 = xv * xv
        m1 = jnp.sum(xv, axis=(1, 2))
        m2r = jnp.sum(x2, axis=(1, 2))
        m3r = jnp.sum(x2 * xv, axis=(1, 2))
        m4r = jnp.sum(x2 * x2, axis=(1, 2))
        return na, bh, m1, m2r, m3r, m4r

    # ---- narrow sub-stages (each extends counts_fn) ----
    def _excess(cc, thr2):
        xb, ib = blocks(cc)
        thr_b = jnp.take(thr2, thr_at(ib), axis=1)
        excess = jnp.where(ib[None] < n, xb - thr_b + margin, -jnp.inf)
        return xb, excess

    kb, k = 256, 1024

    def topk1_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, excess = _excess(cc, thr2)
        counts = jnp.sum(excess > 0.0, axis=-1)
        _, bidx = jax.lax.top_k(counts, kb)
        return jnp.sum(bidx, axis=-1)

    def gsel_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, excess = _excess(cc, thr2)
        counts = jnp.sum(excess > 0.0, axis=-1)
        _, bidx = jax.lax.top_k(counts, kb)
        blk_x = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
        return jnp.sum(blk_x, axis=(1, 2))

    def gthr_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, excess = _excess(cc, thr2)
        counts = jnp.sum(excess > 0.0, axis=-1)
        _, bidx = jax.lax.top_k(counts, kb)
        blk_x = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
        i_sel = bidx[:, :, None] * Bc + jnp.arange(Bc, dtype=jnp.int32)
        thr_sel = jnp.take_along_axis(
            thr2, thr_at(i_sel).reshape(n_tp, -1), axis=1
        ).reshape(n_tp, kb, Bc)
        exc_sel = jnp.where(i_sel < n, blk_x - thr_sel + margin, -jnp.inf)
        return jnp.sum(exc_sel, axis=(1, 2))

    def topk2_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, excess = _excess(cc, thr2)
        counts = jnp.sum(excess > 0.0, axis=-1)
        _, bidx = jax.lax.top_k(counts, kb)
        blk_x = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
        i_sel = bidx[:, :, None] * Bc + jnp.arange(Bc, dtype=jnp.int32)
        thr_sel = jnp.take_along_axis(
            thr2, thr_at(i_sel).reshape(n_tp, -1), axis=1
        ).reshape(n_tp, kb, Bc)
        exc_sel = jnp.where(i_sel < n, blk_x - thr_sel + margin, -jnp.inf)
        n_sub = Bc // L2_SUB
        exc_sub = exc_sel.reshape(n_tp, kb * n_sub, L2_SUB)
        counts2 = jnp.sum(exc_sub > 0.0, axis=-1)
        l2 = min(L2_KEEP, kb * n_sub)
        _, sidx = jax.lax.top_k(counts2, l2)
        exc_l2 = jnp.take_along_axis(
            exc_sub, sidx[:, :, None], axis=1
        ).reshape(n_tp, l2 * L2_SUB)
        return jnp.sum(exc_l2, axis=-1)

    def topk3_fn(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, excess = _excess(cc, thr2)
        counts = jnp.sum(excess > 0.0, axis=-1)
        _, bidx = jax.lax.top_k(counts, kb)
        blk_x = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
        i_sel = bidx[:, :, None] * Bc + jnp.arange(Bc, dtype=jnp.int32)
        thr_sel = jnp.take_along_axis(
            thr2, thr_at(i_sel).reshape(n_tp, -1), axis=1
        ).reshape(n_tp, kb, Bc)
        exc_sel = jnp.where(i_sel < n, blk_x - thr_sel + margin, -jnp.inf)
        n_sub = Bc // L2_SUB
        exc_sub = exc_sel.reshape(n_tp, kb * n_sub, L2_SUB)
        counts2 = jnp.sum(exc_sub > 0.0, axis=-1)
        l2 = min(L2_KEEP, kb * n_sub)
        _, sidx = jax.lax.top_k(counts2, l2)
        exc_l2 = jnp.take_along_axis(
            exc_sub, sidx[:, :, None], axis=1
        ).reshape(n_tp, l2 * L2_SUB)
        kk = min(k, l2 * L2_SUB)
        top_exc, p = jax.lax.top_k(exc_l2, kk)
        return jnp.sum(top_exc, axis=-1)

    # ---- new narrowing (arithmetic thresholds, carried values) ----
    def _new_pre(cc, gauss, num_dev, caps):
        thr2 = pass1_fn(cc, gauss, num_dev, caps)
        xb, excess = _excess(cc, thr2)
        counts = jnp.sum(excess > 0.0, axis=-1)
        _, bidx = jax.lax.top_k(counts, kb)
        blk_x = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
        i0 = bidx * Bc
        qs = i0 // shift
        t_lo = jnp.take_along_axis(thr2, jnp.minimum(qs, n_win - 1), axis=1)
        t_hi = jnp.take_along_axis(
            thr2, jnp.minimum(qs + 1, n_win - 1), axis=1)
        t_tail = thr2[:, -1][:, None, None]
        i_sel = i0[:, :, None] + jnp.arange(Bc, dtype=jnp.int32)
        bnd = ((qs + 1) * shift)[:, :, None]
        thr_sel = jnp.where(
            i_sel >= n - shift, t_tail,
            jnp.where(i_sel >= bnd, t_hi[:, :, None], t_lo[:, :, None]))
        exc_sel = jnp.where(i_sel < n, blk_x - thr_sel + margin, -jnp.inf)
        n_sub = Bc // L2_SUB
        exc_sub = exc_sel.reshape(n_tp, kb * n_sub, L2_SUB)
        counts2 = jnp.sum(exc_sub > 0.0, axis=-1)
        l2 = min(L2_KEEP, kb * n_sub)
        _, sidx = jax.lax.top_k(counts2, l2)

        def _sub_take(a):
            return jnp.take_along_axis(
                a.reshape(n_tp, kb * n_sub, L2_SUB), sidx[:, :, None],
                axis=1).reshape(n_tp, l2 * L2_SUB)

        exc_l2 = _sub_take(exc_sel)
        cc_l2 = _sub_take(blk_x)
        thr_l2 = _sub_take(thr_sel)
        base = (jnp.take_along_axis(bidx, sidx // n_sub, axis=1) * Bc
                + (sidx % n_sub) * L2_SUB)
        gidx_l2 = (base[:, :, None]
                   + jnp.arange(L2_SUB, dtype=jnp.int32)
                   ).reshape(n_tp, l2 * L2_SUB)
        return exc_l2, cc_l2, thr_l2, gidx_l2

    def newpre_fn(cc, gauss, num_dev, caps):
        e, c, t, g = _new_pre(cc, gauss, num_dev, caps)
        return (jnp.sum(e, axis=-1), jnp.sum(c, axis=-1),
                jnp.sum(t, axis=-1), jnp.sum(g, axis=-1))

    def sort1_fn(cc, gauss, num_dev, caps):
        e, c, t, g = _new_pre(cc, gauss, num_dev, caps)
        s = jax.lax.sort(-e, dimension=-1)
        return jnp.sum(s[:, :1024], axis=-1)

    def sort4_fn(cc, gauss, num_dev, caps):
        e, c, t, g = _new_pre(cc, gauss, num_dev, caps)
        ns, gs, cs, ts = jax.lax.sort((-e, g, c, t), num_keys=1)
        return (jnp.sum(ns[:, :1024], axis=-1), gs[:, :1024],
                cs[:, :1024], ts[:, :1024])

    def tk3b_fn(cc, gauss, num_dev, caps):
        e, c, t, g = _new_pre(cc, gauss, num_dev, caps)
        v, p = jax.lax.top_k(e, 1024)
        return (v, jnp.take_along_axis(g, p, axis=1),
                jnp.take_along_axis(c, p, axis=1),
                jnp.take_along_axis(t, p, axis=1))

    for label, fn in [
        ("pass1", pass1_fn), ("gather", gather_fn),
        ("counts", counts_fn), ("moments", moments_fn),
        ("topk1", topk1_fn), ("gsel", gsel_fn), ("gthr", gthr_fn),
        ("topk2", topk2_fn), ("topk3", topk3_fn),
        ("newpre", newpre_fn), ("sort1", sort1_fn),
        ("sort4", sort4_fn), ("tk3b", tk3b_fn),
    ]:
        jf = jax.jit(fn)
        timed(label, lambda jf=jf: fetch(jf(cc, gauss, num_dev, caps)))

    from seismic_bpmf_tpu.ops.thresholds import _rms_cov_len
    n_cov = _rms_cov_len(n, win, shift, n_win)
    g_tiled = jnp.asarray(np.resize(wn, n_cov))

    def narrow():
        out = _batch_candidates_rms_fused(
            cc, g_tiled, num_dev, caps, margin, win=win, shift=shift,
            n_win=n_win, k=1024, k_blocks=256, G=G, n=n)
        return [np.asarray(a) for a in out]

    timed("narrow", narrow)

    def vmapped():
        out = _batch_candidates_kernel(
            cc, gauss, num_dev, caps, margin, win=win, shift=shift,
            n_win=n_win, k=1024, k_blocks=256, threshold_type="rms")
        return [np.asarray(a) for a in out]

    timed("vmapped", vmapped)


if __name__ == "__main__":
    main()
