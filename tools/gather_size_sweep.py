"""XLA gather throughput vs table size + rank-based dense lookup prototype.

tools/pallas_gather_bench.py found a 2 MB table gathers at ~2.1 G elem/s vs
the ~150 M elem/s measured on the 64 MB level-0 dense tables — if that's a
size cliff, replacing the int32 dense table with occupancy bits + per-word
prefix counts + a rank->row permutation (~4.06 MB total for 256^3) makes
every probe 3 small-table gathers instead of 1 huge-table gather.

Run:  nohup python tools/gather_size_sweep.py > /tmp/gather_sweep.log &
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

N = 27 * 16384


def _time(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return out, (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    for mb in (0.25, 0.5, 1, 2, 4, 8, 16, 32, 64):
        words = int(mb * (1 << 20)) // 4
        table = jnp.asarray(rng.integers(0, 1 << 30, words, dtype=np.int64)
                            .astype(np.int32))
        idx = jnp.asarray(rng.integers(0, words, N, dtype=np.int64)
                          .astype(np.int32))
        _, dt = _time(jax.jit(lambda t, i: t[i]), table, idx)
        print(f"gather {mb:6.2f} MB: {dt*1e3:7.3f} ms "
              f"({N/dt/1e6:6.0f} M elem/s)")

    # rank-based lookup prototype at 256^3 (the level-0 dense extent)
    cells = 256 ** 3
    nrows = 16384
    occ_addr = np.sort(rng.choice(cells, nrows, replace=False))
    occ = np.zeros(cells // 32, np.uint32)
    np.bitwise_or.at(occ, occ_addr >> 5,
                     np.uint32(1) << (occ_addr & 31).astype(np.uint32))
    prefix = np.concatenate([[0], np.cumsum(
        np.array([bin(w).count("1") for w in occ]))[:-1]]).astype(np.int32)
    perm = rng.permutation(nrows).astype(np.int32)  # addr-rank -> row id
    dense = np.full(cells, -1, np.int32)
    dense[occ_addr] = perm

    q = rng.integers(0, cells, N, dtype=np.int64).astype(np.int32)
    # make ~half the queries hit
    q[: N // 2] = occ_addr[rng.integers(0, nrows, N // 2)]

    occ_j, prefix_j, perm_j, dense_j, q_j = map(
        jnp.asarray, (occ, prefix, perm, dense, q))

    def rank_lookup(occ, prefix, perm, q):
        w = (q >> 5).astype(jnp.int32)
        b = (q & 31).astype(jnp.uint32)
        word = occ[w]
        hit = ((word >> b) & 1).astype(jnp.bool_)
        below = word & ((jnp.uint32(1) << b) - 1)
        rank = prefix[w] + jax.lax.population_count(below).astype(jnp.int32)
        row = perm[jnp.minimum(rank, perm.shape[0] - 1)]
        return jnp.where(hit, row, -1)

    def dense_lookup(dense, q):
        return dense[q]

    ref, dt0 = _time(jax.jit(dense_lookup), dense_j, q_j)
    print(f"dense 64MB lookup: {dt0*1e3:7.3f} ms ({N/dt0/1e6:6.0f} M/s)")
    out, dt1 = _time(jax.jit(rank_lookup), occ_j, prefix_j, perm_j, q_j)
    print(f"rank 4MB lookup:   {dt1*1e3:7.3f} ms ({N/dt1/1e6:6.0f} M/s)  "
          f"exact={bool(jnp.array_equal(out, ref))}")


if __name__ == "__main__":
    main()
