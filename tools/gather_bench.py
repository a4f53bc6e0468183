"""Measure the TPU gather/scatter cost laws that govern the slot-sum design.

The edge-compacted convolution composes per-edge products with a
``flat[out_slots].sum(1)`` gather (ops/edge_conv._slot_sum). The r3a trace
showed that gather at ~379 ms/pair once exactness caps widened (out_slots is
[M, d_cap] and the bench regime's mean degree is 10-40x below the cap), so
the next design must make cost track LIVE edges, not capacity. Candidate
compositions measured here, all computing the same per-row sum:

  slotsum   -- the current form: flat[M, D slots, cout] gather + sum
  tiered    -- degree-sorted rows, dynamic chunk loop over live rows only
  permsum   -- permute products to row order (E-sized gather)
  onehot    -- blocked one-hot matmul segment-sum (MXU)

Methodology: K data-dependent repetitions inside ONE jitted fori_loop;
marginal cost = (t_K - t_1) / (K - 1). Host-side chained dispatches measured
a flat ~45-50 ms/call regardless of shape (tunnel round-trip latency when
calls can't pipeline), and same-input repeats pipeline into fake
1000x-roofline rates — both are dispatch artifacts, not compute. The chain
perturbs the INDICES with isnan(sum(out)) (runtime zero): `x + 0.0 * out`
is algebraically eliminated by XLA (the loop hoists), and a flag off one
element lets DCE strip all but one row of the intermediate gathers.

Run on the real chip: python tools/gather_bench.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    from deepglobalregistration_tpu.utils.platform import (
        enable_compilation_cache, select_platform)

    enable_compilation_cache()
    select_platform()

    import jax
    import jax.numpy as jnp

    # Fresh input values every run: the tunnel memoizes (program, input
    # values) ACROSS PROCESSES — rerunning with rng seed 0 returned 50M-el
    # gathers in 0.03 ms straight from the cache.
    seed = args.seed if args.seed is not None else int(time.time()) % 100000
    print(f"seed {seed}", flush=True)
    rng = np.random.RandomState(seed)
    m = args.m
    K = args.k

    def marginal(make_fn, feed, *const_args):
        """make_fn(k) -> jitted fn running k chained reps; returns ms/rep.

        feed: the array whose values each rep perturbs (forces serialization).
        """
        def timed(fn):
            out = fn(feed, *const_args)
            jax.block_until_ready(out)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(feed, *const_args))
                best = min(best, time.perf_counter() - t0)
            return best * 1e3

        # Difference two loop counts >= 4: single-rep executables return
        # memoized/pipelined times through the tunnel (k=1 measured 0.04 ms
        # for a 50M-element gather; k=4 vs 16 vs 64 scale linearly).
        t_lo = timed(make_fn(4))
        t_hi = timed(make_fn(4 + K))
        return (t_hi - t_lo) / K

    # --- law 1: flat[slots] gather rate vs (D, cout, dtype) ---------------
    for cout in (32, 64, 128):
        for d in (8, 27, 48):
            s_flat = m * d
            flat = jnp.asarray(
                rng.randn(s_flat + 1, cout).astype(np.float32))
            flat16 = flat.astype(jnp.bfloat16)
            slots = jnp.asarray(
                rng.randint(0, s_flat, size=(m, d)).astype(np.int32))

            def make(k):
                @jax.jit
                def go(f, s):
                    def body(_, carry):
                        s_, acc = carry
                        out = jnp.sum(f[s_], axis=1, dtype=jnp.float32)
                        flag = jnp.isnan(jnp.sum(out)).astype(jnp.int32)
                        return s_ + flag, out

                    _, out = jax.lax.fori_loop(
                        0, k, body, (s, jnp.zeros((m, f.shape[1]))))
                    return out
                return go

            ms32 = marginal(make, flat, slots)
            ms16 = marginal(make, flat16, slots)
            n_el = m * d * cout
            print(f"slotsum D={d:3d} cout={cout:3d}: f32 {ms32:7.2f} ms "
                  f"({n_el / max(ms32, 1e-3) / 1e3:6.0f}M el/s)  "
                  f"bf16 {ms16:7.2f} ms "
                  f"({n_el / max(ms16, 1e-3) / 1e3:6.0f}M el/s)", flush=True)

    # --- law 2: same gather but all slots point at ONE row (cache) --------
    cout, d = 64, 48
    s_flat = m * d
    flat = jnp.asarray(rng.randn(s_flat + 1, cout).astype(np.float32)
                       ).astype(jnp.bfloat16)
    ones_slots = jnp.full((m, d), s_flat, jnp.int32)

    def make_g(k):
        @jax.jit
        def go(f, s):
            def body(_, carry):
                s_, acc = carry
                out = jnp.sum(f[s_], axis=1, dtype=jnp.float32)
                flag = jnp.isnan(jnp.sum(out)).astype(jnp.int32)
                return s_ + flag, out

            _, out = jax.lax.fori_loop(0, k, body,
                                       (s, jnp.zeros((m, cout))))
            return out
        return go

    print(f"slotsum single-row target D=48 cout=64 bf16: "
          f"{marginal(make_g, flat, ones_slots):7.2f} ms", flush=True)

    # --- law 3: dynamic-bound chunked gather (tiered prototype) -----------
    w = 48
    slots_full = jnp.asarray(
        rng.randint(0, s_flat, size=(m, w)).astype(np.int32))
    ch = 512
    for frac in (1.0, 0.25, 0.05):
        nl = jnp.int32(int(m * frac))

        def make_t(k):
            @jax.jit
            def go(f, s, n):
                def rep(_, carry):
                    s_, acc = carry

                    def body(c, a):
                        sl = jax.lax.dynamic_slice(s_, (c * ch, 0), (ch, w))
                        extra = jnp.sum(f[sl], axis=1, dtype=jnp.float32)
                        return jax.lax.dynamic_update_slice(
                            a, extra, (c * ch, 0))

                    acc0 = jnp.zeros((m, cout), jnp.float32)
                    out = jax.lax.fori_loop(0, -(-n // ch), body, acc0)
                    flag = jnp.isnan(jnp.sum(out)).astype(jnp.int32)
                    return s_ + flag, out

                _, out = jax.lax.fori_loop(0, k, rep,
                                           (s, jnp.zeros((m, cout))))
                return out
            return go

        ms = marginal(make_t, flat, slots_full, nl)
        print(f"tiered w=48 cout=64 live={frac:4.2f}: {ms:7.2f} ms",
              flush=True)

    # --- law 4: row-sorted permutation gather (E-sized) -------------------
    for e in (32768, 131072):
        perm = jnp.asarray(rng.permutation(e).astype(np.int32))
        prods = jnp.asarray(rng.randn(e, cout).astype(np.float32)
                            ).astype(jnp.bfloat16)

        def make_p(k):
            @jax.jit
            def go(pr, p):
                def body(_, carry):
                    p_, acc = carry
                    out = pr[p_]
                    flag = jnp.isnan(
                        jnp.sum(out.astype(jnp.float32))).astype(jnp.int32)
                    return p_ + flag, out

                _, out = jax.lax.fori_loop(
                    0, k, body, (p, jnp.zeros((e, cout), pr.dtype)))
                return out
            return go

        ms = marginal(make_p, prods, perm)
        print(f"perm-gather E={e} cout={cout}: {ms:7.2f} ms "
              f"({e * cout / max(ms, 1e-3) / 1e3:6.0f}M el/s)", flush=True)

    # --- law 5: blocked one-hot matmul segment-sum over row-sorted prods --
    e = 131072
    blk = 2048
    prods = jnp.asarray(rng.randn(e, cout).astype(np.float32)
                        ).astype(jnp.bfloat16)
    rows_j = jnp.asarray(np.sort(rng.randint(0, m, size=e)).astype(np.int32))

    def make_o(k):
        @jax.jit
        def go(pr, rw):
            def rep(_, carry):
                rw_, acc_out = carry
                nb = e // blk

                def body(c, acc):
                    r = jax.lax.dynamic_slice(rw_, (c * blk,), (blk,))
                    p = jax.lax.dynamic_slice(pr, (c * blk, 0), (blk, cout))
                    base = r[0]
                    local = r - base
                    oh = (local[None, :] ==
                          jnp.arange(blk, dtype=jnp.int32)[:, None])
                    seg = jnp.dot(oh.astype(jnp.bfloat16), p,
                                  preferred_element_type=jnp.float32)
                    cur = jax.lax.dynamic_slice(acc, (base, 0), (blk, cout))
                    return jax.lax.dynamic_update_slice(
                        acc, cur + seg, (base, 0))

                acc0 = jnp.zeros((m + blk, cout), jnp.float32)
                out = jax.lax.fori_loop(0, nb, body, acc0)
                flag = jnp.isnan(jnp.sum(out)).astype(jnp.int32)
                return rw_ + flag, out

            _, out = jax.lax.fori_loop(
                0, k, rep, (rw, jnp.zeros((m + blk, cout))))
            return out
        return go

    ms = marginal(make_o, prods, rows_j)
    print(f"onehot-segsum E={e} blk={blk} cout={cout}: {ms:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
