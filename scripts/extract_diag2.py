"""Micro-attribution inside _candidate_extract_two_stage on the chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _force(out):
    """Force remote completion with a 1-element fetch per leaf: through
    the remote tunnel jax.block_until_ready returns at dispatch, so only
    materializing bytes on the host proves the program ran."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
    return out


def timed(label, fn, reps=3):
    _force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _force(fn())
        ts.append(time.time() - t0)
    print(f"{label:>16}: min {min(ts)*1e3:8.1f} ms", file=sys.stderr)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_tp, n = 128, 2_160_000
    block, k, k_blocks = 512, 1024, 256
    n_blocks = -(-n // block)
    pad = n_blocks * block - n

    cc = jnp.asarray(rng.normal(size=(n_tp, n)).astype(np.float32) * 0.02)
    thr = jnp.full((n_tp, n), 0.12, jnp.float32)
    cc.block_until_ready(); thr.block_until_ready()

    @jax.jit
    def excess_counts(cc, thr):
        excess = cc - thr
        ep = jnp.pad(excess, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        eb = ep.reshape(n_tp, n_blocks, block)
        counts = jnp.sum(eb > 0.0, axis=-1)
        return counts, eb

    counts, eb = excess_counts(cc, thr)
    jax.block_until_ready((counts, eb))
    timed("excess+counts", lambda: jax.block_until_ready(
        excess_counts(cc, thr)))

    @jax.jit
    def blocksel(counts):
        return jax.lax.top_k(counts, k_blocks)

    timed("topk blocks", lambda: jax.block_until_ready(blocksel(counts)))
    _, bidx = blocksel(counts)

    @jax.jit
    def gather(eb, bidx):
        return jnp.take_along_axis(
            eb, bidx[:, :, None], axis=1
        ).reshape(n_tp, -1)

    timed("gather", lambda: jax.block_until_ready(gather(eb, bidx)))
    flat = gather(eb, bidx)

    @jax.jit
    def bigtopk(flat):
        return jax.lax.top_k(flat, k)

    timed("topk flat131k", lambda: jax.block_until_ready(bigtopk(flat)))

    @jax.jit
    def kurt(cc):
        mu = jnp.mean(cc, axis=-1, keepdims=True)
        d = cc - mu
        m2 = jnp.mean(d * d, axis=-1)
        m4 = jnp.mean(d ** 4, axis=-1)
        return jnp.where(m2 > 0, m4 / (m2 * m2) - 3.0, 0.0)

    timed("kurtosis", lambda: jax.block_until_ready(kurt(cc)))

    # hierarchical narrowing candidate: 131072 -> count 32-sub-blocks ->
    # top 256 of 2048 -> flat 8192 -> topk
    @jax.jit
    def hier(flat):
        sub = 32
        fb = flat.reshape(n_tp, -1, sub)          # (., 4096, 32)
        c2 = jnp.sum(fb > 0.0, axis=-1)
        _, si = jax.lax.top_k(c2, 256)
        f2 = jnp.take_along_axis(fb, si[:, :, None], axis=1)
        return jax.lax.top_k(f2.reshape(n_tp, -1), k)

    timed("hier 131k->8k", lambda: jax.block_until_ready(hier(flat)))

    # sort-free compaction: positives are index-ordered via iota keys
    @jax.jit
    def iota_sort(flat):
        iota = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
        keys = jnp.where(flat > 0.0, iota, jnp.int32(2**30))
        srt = jax.lax.sort(keys, dimension=-1)
        return srt[:, :k]

    timed("iota sort131k", lambda: jax.block_until_ready(iota_sort(flat)))


if __name__ == "__main__":
    main()
