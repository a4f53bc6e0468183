"""Group compaction of multimap slots must not change the edge maps.

ops/edge_conv.compact_slots_grouped compacts each (3D offset, output row)'s
B member slots to its first group_cap verified edges BEFORE the per-row
d_cap compaction. Because the rank permutation preserves within-group order,
the flat per-row edge sequence the downstream compaction consumes is
unchanged — so every derived structure (tiles, out_slots, tiers) must be
bit-identical to the ungrouped build whenever no (a, j) exceeds the cap.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepglobalregistration_tpu.models import unet_plan
from deepglobalregistration_tpu.ops import edge_conv, kernel_map

_CAP = 4096  # smallest capacity at which group compaction engages


def _bench_crop_grid():
    """Spatial crop of a pinned trained-matching bench grid: preserves the
    bench distribution's LOCAL density (which the caps were tuned for) at a
    capacity small enough for a fast CPU build."""
    path = pathlib.Path(__file__).parent / "data" / "bench_c6_trained.npz"
    if not path.exists():
        pytest.skip("bench_c6_trained.npz fixture not generated")
    c6 = np.load(path)["seed0"].astype(np.int32)
    lo = np.quantile(c6[:, 0], 0.30)
    hi = np.quantile(c6[:, 0], 0.55)
    sel = (c6[:, 0] >= lo) & (c6[:, 0] < hi)
    c6 = c6[sel][:_CAP - 128]
    n = len(c6)
    assert n >= 2000, "crop too small to exercise the deep levels"
    pad = np.full((_CAP - n, 3), 32766, np.int32)
    return (np.concatenate([c6[:, :3], pad]),
            np.concatenate([c6[:, 3:], pad]), n)


def _build(c0, c1, n):
    return jax.jit(lambda a, b, m: unet_plan.build_paired_unet_plan(
        a, b, m, 3, kernel_map.HYPER_CUBE, 4, 1,
        dense_extent=(128, 128, 128)))(
        jnp.asarray(c0), jnp.asarray(c1), jnp.int32(n))


def _assert_maps_equal(a, b, name):
    assert a.out_rows == b.out_rows
    for field in ("tile_in", "tile_out", "tile_k", "out_slots", "row_inv",
                  "tier_bounds"):
        fa, fb = getattr(a.em, field), getattr(b.em, field)
        if fa is None or fb is None:
            assert fa is None and fb is None, (name, field)
            continue
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb),
                                      err_msg=f"{name}.{field}")


def test_grouped_compaction_identical_maps(monkeypatch):
    c0, c1, n = _bench_crop_grid()

    plan_grouped = _build(c0, c1, n)
    assert not bool(plan_grouped.overflow), (
        "group caps under-sized for the bench-crop grid — widen "
        "_AJ_CAP_6D or loosen the test distribution")

    monkeypatch.setattr(unet_plan, "_AJ_CAP_6D", (0, 0, 0, 0))
    plan_plain = _build(c0, c1, n)
    assert not bool(plan_plain.overflow)

    for i, (a, b) in enumerate(zip(plan_grouped.self_kmaps,
                                   plan_plain.self_kmaps)):
        _assert_maps_equal(a, b, f"self{i}")
    for i, (a, b) in enumerate(zip(plan_grouped.down_kmaps,
                                   plan_plain.down_kmaps)):
        _assert_maps_equal(a, b, f"down{i}")
    for i, (a, b) in enumerate(zip(plan_grouped.up_kmaps,
                                   plan_plain.up_kmaps)):
        _assert_maps_equal(a, b, f"up{i}")


def test_compact_slots_grouped_unit():
    """Direct unit check: order-preserving prefix take + overflow flag."""
    a, m, b_slots = 2, 3, 5
    rng = np.random.default_rng(0)
    sk = rng.integers(-1, 8, size=(a, m, b_slots)).astype(np.int32)
    si = np.where(sk >= 0, rng.integers(0, 9, size=sk.shape), -1).astype(
        np.int32)
    cap = 3
    gk, gi, ov = jax.jit(edge_conv.compact_slots_grouped,
                         static_argnums=2)(sk, si, cap)
    gk, gi = np.asarray(gk), np.asarray(gi)
    worst = 0
    for i in range(a):
        for j in range(m):
            pairs = [(int(k), int(v)) for k, v in zip(sk[i, j], si[i, j])
                     if k >= 0 and v >= 0]
            worst = max(worst, len(pairs))
            kept = pairs[:cap]
            got = [(int(k), int(v)) for k, v in zip(gk[i, j], gi[i, j])
                   if v >= 0]
            assert got == kept, (i, j)
            # tail is empty-marked
            assert all(int(k) == -1 for k in gk[i, j][len(kept):])
    assert bool(ov) == (worst > cap)
