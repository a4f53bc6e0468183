"""Microbenchmark: dynamic vector gather from a VMEM-resident table (Pallas).

The r5 trace puts ~100 ms/pair in XLA element gathers against the dense
coordinate tables (dense_grid.py:94/159/226) — HBM-latency-bound random
access at ~100-200 M elem/s. A rank-based probe (occupancy bits + per-word
prefix counts, ~4 MB total) would fit VMEM, IF Mosaic can express a fast
dynamic gather from a VMEM ref. This measures the candidate formulations on
the real chip against the XLA baseline before any kernel work starts
(STATUS.md open item 1, "wedge-risk, do early in a round").

Run:  nohup python tools/pallas_gather_bench.py > /tmp/pallas_gather.log &
Never timeout-kill TPU scripts (relay death, see .claude/skills/verify).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORDS = 512 * 1024  # 2 MB uint32 table (256^3 occupancy bits)
N = 27 * 16384      # probes per kernel-map build at bench shape
BLK = 2048


def _time(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    return out, dt


def xla_gather(table, idx):
    return table[idx]


def pallas_take(table, idx):
    """Grid over index blocks; whole table resident in VMEM; jnp.take."""

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:].reshape(-1), idx_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((WORDS // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
    )(table.reshape(WORDS // 128, 128), idx)


def pallas_take2d(table, idx):
    """2D variant: gather rows by sublane index, then select lane.

    take_along_axis(tab[idx >> 7], idx & 127) — row gather along the
    sublane axis may lower where flat takes do not."""

    def kernel(tab_ref, idx_ref, out_ref):
        ix = idx_ref[:]
        rows = jnp.take(tab_ref[:], ix >> 7, axis=0)  # [BLK, 128]
        out_ref[:] = jnp.take_along_axis(
            rows, (ix & 127)[:, None], axis=1)[:, 0]

    return pl.pallas_call(
        kernel,
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((WORDS // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
    )(table.reshape(WORDS // 128, 128), idx)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, WORDS, dtype=np.int64)
                        .astype(np.int32))
    idx = jnp.asarray(rng.integers(0, WORDS, N, dtype=np.int64)
                      .astype(np.int32))

    ref, dt = _time(jax.jit(xla_gather), table, idx)
    print(f"xla_gather: {dt*1e3:.3f} ms  ({N/dt/1e6:.0f} M elem/s)")

    for name, fn in (("pallas_take", pallas_take),
                     ("pallas_take2d", pallas_take2d)):
        try:
            out, dt = _time(jax.jit(fn), table, idx)
            ok = bool(jnp.array_equal(out, ref))
            print(f"{name}: {dt*1e3:.3f} ms  ({N/dt/1e6:.0f} M elem/s)"
                  f"  exact={ok}")
        except Exception as e:  # noqa: BLE001 — survey which forms lower
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
