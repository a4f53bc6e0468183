"""Edge-compacted convolution: exact equivalence with the dense gather-GEMM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.ops import edge_conv, sparse_conv


def _random_kmap(rng, k, m, n, density):
    """Dense kernel map with the given entry density; -1 = empty."""
    kmap = np.full((k, m), -1, np.int32)
    mask = rng.rand(k, m) < density
    kmap[mask] = rng.randint(0, n, size=int(mask.sum()))
    return kmap


@pytest.mark.parametrize("k,density,d_cap,tile", [
    (27, 0.3, 27, 32),     # 3D-like self map
    (729, 0.02, 32, 64),   # 6D-like sparse map
    (729, 0.0, 8, 32),     # fully empty
])
def test_edge_conv_matches_dense(rng, k, density, d_cap, tile):
    n = m = 256
    cin, cout = 8, 16
    kmap = _random_kmap(rng, k, m, n, density)
    # keep per-row degree within d_cap so the comparison is exact
    for j in range(m):
        valid = np.where(kmap[:, j] >= 0)[0]
        if len(valid) > d_cap:
            kmap[valid[d_cap:], j] = -1
    feats = rng.randn(n, cin).astype(np.float32)
    kernel = rng.randn(k, cin, cout).astype(np.float32)

    dense = np.asarray(sparse_conv.sparse_conv(
        jnp.asarray(feats), jnp.asarray(kernel), jnp.asarray(kmap)))
    em = edge_conv.build_edge_map(jnp.asarray(kmap), d_cap=d_cap, tile=tile)
    assert not bool(em.overflow)
    got = np.asarray(edge_conv.sparse_conv_edges(
        jnp.asarray(feats), jnp.asarray(kernel), em, out_rows=m))
    np.testing.assert_allclose(got, dense, rtol=1e-5, atol=1e-5)


def test_edge_conv_different_out_rows(rng):
    # strided map: M != N
    n, m, k, cin, cout = 300, 100, 27, 4, 8
    kmap = _random_kmap(rng, k, m, n, 0.4)
    feats = rng.randn(n, cin).astype(np.float32)
    kernel = rng.randn(k, cin, cout).astype(np.float32)
    dense = np.asarray(sparse_conv.sparse_conv(
        jnp.asarray(feats), jnp.asarray(kernel), jnp.asarray(kmap)))
    em = edge_conv.build_edge_map(jnp.asarray(kmap), d_cap=27, tile=16)
    got = np.asarray(edge_conv.sparse_conv_edges(
        jnp.asarray(feats), jnp.asarray(kernel), em, out_rows=m))
    np.testing.assert_allclose(got, dense, rtol=1e-5, atol=1e-5)


def test_edge_conv_overflow_flag(rng):
    kmap = _random_kmap(rng, 27, 64, 64, 0.9)
    em = edge_conv.build_edge_map(jnp.asarray(kmap), d_cap=4, tile=16)
    assert bool(em.overflow)


def test_edge_conv_bias_and_jit(rng):
    n = m = 128
    kmap = _random_kmap(rng, 27, m, n, 0.3)
    feats = rng.randn(n, 4).astype(np.float32)
    kernel = rng.randn(27, 4, 8).astype(np.float32)
    bias = rng.randn(8).astype(np.float32)

    @jax.jit
    def run(f, w, b, km):
        em = edge_conv.build_edge_map(km, d_cap=27, tile=32)
        return edge_conv.sparse_conv_edges(f, w, em, bias=b, out_rows=m)

    got = np.asarray(run(jnp.asarray(feats), jnp.asarray(kernel),
                         jnp.asarray(bias), jnp.asarray(kmap)))
    dense = np.asarray(sparse_conv.sparse_conv(
        jnp.asarray(feats), jnp.asarray(kernel), jnp.asarray(kmap),
        bias=jnp.asarray(bias)))
    np.testing.assert_allclose(got, dense, rtol=1e-5, atol=1e-5)


def test_edge_conv_vmapped(rng):
    b, n, k = 3, 128, 27
    kmaps = np.stack([_random_kmap(rng, k, n, n, 0.25) for _ in range(b)])
    feats = rng.randn(b, n, 4).astype(np.float32)
    kernel = rng.randn(k, 4, 8).astype(np.float32)

    def one(f, km):
        em = edge_conv.build_edge_map(km, d_cap=16, tile=32)
        return edge_conv.sparse_conv_edges(f, jnp.asarray(kernel), em)

    got = np.asarray(jax.vmap(one)(jnp.asarray(feats), jnp.asarray(kmaps)))
    for i in range(b):
        dense = np.asarray(sparse_conv.sparse_conv(
            jnp.asarray(feats[i]), jnp.asarray(kernel), jnp.asarray(kmaps[i])))
        np.testing.assert_allclose(got[i], dense, rtol=1e-5, atol=1e-5)


def test_inlier_net_edge_plan_matches_dense(rng):
    """Full 6D inlier net: the edge-compacted plan must reproduce the dense
    gather-GEMM plan's logits (f32 accumulation tolerance)."""
    from deepglobalregistration_tpu.models import load_model, unet_plan
    from deepglobalregistration_tpu.ops.sparse_grid import Grid

    spec = load_model("ResUNetBN2FX")
    cfg = spec.make_config(1, 1, conv1_kernel_size=3, normalize_feature=False,
                           D=6)
    params, state = spec.init(jax.random.PRNGKey(1), cfg)

    n, cap = 180, 256
    c0 = rng.randint(-10, 10, size=(cap, 3)).astype(np.int32)
    c0[:n] = np.unique(rng.randint(-12, 12, size=(n * 2, 3)), axis=0)[:n]
    c1 = rng.randint(-10, 10, size=(cap, 3)).astype(np.int32)
    coords6 = np.concatenate([c0, c1], axis=1)
    grid = Grid(coords=jnp.asarray(coords6), num=jnp.int32(n))
    feats = rng.randn(1, cap, 1).astype(np.float32)

    def run():
        plan = jax.vmap(spec.build_plan, in_axes=(0, None))(
            jax.tree.map(lambda x: x[None], grid), cfg)
        out, _ = spec.apply(params, state, cfg, plan, jnp.asarray(feats),
                            train=False)
        return np.asarray(out)

    unet_plan.EDGE_CONV_6D = False
    try:
        dense = run()
    finally:
        unet_plan.EDGE_CONV_6D = True
    edge = run()
    np.testing.assert_allclose(edge, dense, rtol=1e-4, atol=1e-4)


# ~50 s of CPU compile per variant: the production HYPER_CUBE model stays in
# the default tier; the cross-region variant rides the slow tier.
@pytest.mark.parametrize("model", [
    pytest.param("ResUNetBN2FX", marks=pytest.mark.slow),
    "ResUNetBN2F",
])
def test_paired_slot_edge_plan_matches_dense(rng, model):
    """Paired (slot-form) edge plan must reproduce the dense paired plan's
    inlier-net output — validates build_edge_slots_paired's static (a,d1)->k
    table against the canonical offset enumeration, for HYPER_CROSS (X) and
    HYPER_CUBE (the shipped ResUNetBN2C inlier config) regions."""
    from deepglobalregistration_tpu.models import load_model, unet_plan

    spec = load_model(model)
    cfg = spec.make_config(1, 1, conv1_kernel_size=3, normalize_feature=False,
                           D=6)
    params, state = spec.init(jax.random.PRNGKey(2), cfg)

    n, cap = 150, 256
    c0 = np.zeros((cap, 3), np.int32)
    c0[:n] = np.unique(rng.randint(-8, 8, size=(n * 3, 3)), axis=0)[:n]
    c0[n:] = 32766
    idx1 = rng.randint(0, n, size=cap).astype(np.int32)
    c1 = c0[idx1] + rng.randint(-2, 3, size=(cap, 3)).astype(np.int32)
    feats = rng.randn(1, cap, 1).astype(np.float32)

    def run():
        plan = unet_plan.build_paired_unet_plan(
            jnp.asarray(c0), jnp.asarray(c1), jnp.int32(n),
            cfg.conv1_kernel_size, cfg.region_type, cfg.levels, 1)
        plan = jax.tree.map(lambda x: x[None], plan)
        out, _ = spec.apply(params, state, cfg, plan, jnp.asarray(feats),
                            train=False)
        return np.asarray(out)

    unet_plan.EDGE_CONV_6D = False
    try:
        dense = run()
    finally:
        unet_plan.EDGE_CONV_6D = True
    edge = run()
    np.testing.assert_allclose(edge[:, :150], dense[:, :150],
                               rtol=1e-4, atol=1e-4)


def test_up_map_derived_from_down_edges(rng):
    """The transpose (up) edge map derived by in/out-swapping the down edge
    set must reproduce the independently hash-built transpose kernel map's
    conv output."""
    from deepglobalregistration_tpu.ops import hashing, kernel_map
    from deepglobalregistration_tpu.ops.sparse_grid import Grid, stride_down

    n, cap = 200, 256
    coords = np.full((cap, 6), 32766, np.int32)
    coords[:n] = np.unique(rng.randint(-6, 6, size=(n * 2, 6)), axis=0)[:n]
    fine = Grid(coords=jnp.asarray(coords), num=jnp.int32(n))
    coarse = stride_down(fine, 2, out_capacity=cap)

    offs = kernel_map.kernel_offsets(3, 6, kernel_map.HYPER_CUBE)
    table_f = hashing.build_table(fine.coords, fine.num)
    down_dense = kernel_map.build_kernel_map(table_f, coarse, offs, unit=1)
    table_c = hashing.build_table(coarse.coords, coarse.num)
    up_dense = kernel_map.build_kernel_map(table_c, fine, offs, unit=1,
                                           transpose=True)

    feats = rng.randn(cap, 4).astype(np.float32)
    kern = rng.randn(len(offs), 4, 8).astype(np.float32)
    want = np.asarray(sparse_conv.sparse_conv(
        jnp.asarray(feats), jnp.asarray(kern), up_dense))

    _, up_em = edge_conv.build_edge_maps_down_up(down_dense, d_cap=64, tile=32)
    got = np.asarray(edge_conv.sparse_conv_edges(
        jnp.asarray(feats), jnp.asarray(kern), up_em, out_rows=cap))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("transposed", [False, True])
def test_edge_conv_live_budget(rng, transposed):
    """live_cap >= actual edges: exact output, no overflow, smaller tile
    buffers. live_cap < actual edges: overflow flag raised. Covers both the
    gather-sum (out_slots) and scatter (transposed up-map) compositions."""
    n = m = 256
    k, cin, cout, tile = 27, 4, 8, 32
    kmap = _random_kmap(rng, k, m, n, 0.3)
    feats = rng.randn(n, cin).astype(np.float32)
    kernel = rng.randn(k, cin, cout).astype(np.float32)
    n_edges = int((kmap >= 0).sum())

    def build(live_cap):
        if transposed:
            _, up = edge_conv.build_edge_maps_down_up(
                jnp.asarray(kmap), d_cap=27, tile=tile, live_cap=live_cap)
            return up
        return edge_conv.build_edge_map(jnp.asarray(kmap), d_cap=27,
                                        tile=tile, live_cap=live_cap)

    # generous budget: exact equivalence with the unbudgeted map
    full = build(None)
    em = build(n_edges + k * tile)  # every bin's tile padding fits
    assert not bool(em.overflow)
    assert em.tile_in.shape[0] < full.tile_in.shape[0]
    ref = np.asarray(edge_conv.sparse_conv_edges(
        jnp.asarray(feats), jnp.asarray(kernel), full,
        out_rows=n if transposed else m))
    got = np.asarray(edge_conv.sparse_conv_edges(
        jnp.asarray(feats), jnp.asarray(kernel), em,
        out_rows=n if transposed else m))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # starved budget: overflow flag fires
    tiny = build(tile * 2)
    assert bool(tiny.overflow)


@pytest.mark.parametrize("transposed", [False, True])
def test_edge_conv_grads_match_dense(rng, transposed):
    """The streaming custom backward (gather- and scatter-form) must produce
    the same (d feats, d kernel) as autodiff through the dense gather-GEMM.
    Regression for the [M_pad, D, Cout] broadcast the generic VJP
    materialized (15 GB at the training shape — OOMed the chip)."""
    n = m = 192
    k, cin, cout, tile = 27, 5, 7, 32
    kmap = _random_kmap(rng, k, m, n, 0.3)
    feats = rng.randn(n, cin).astype(np.float32)
    kernel = rng.randn(k, cin, cout).astype(np.float32)
    probe = rng.randn(m if not transposed else n, cout).astype(np.float32)

    if transposed:
        # A transposed map can hold several edges per (offset, input row), so
        # no dense [K, M] map expresses it; the reference gradient instead
        # comes from autodiff through the static-bound scatter twin (the
        # previous backward implementation).
        _, em = edge_conv.build_edge_maps_down_up(
            jnp.asarray(kmap), d_cap=27, tile=tile)
        out_rows = n
    else:
        em = edge_conv.build_edge_map(jnp.asarray(kmap), d_cap=27, tile=tile)
        out_rows = m

    def loss_edge(f, w):
        out = edge_conv.sparse_conv_edges(f, w, em, out_rows=out_rows)
        return jnp.sum(out * probe)

    if transposed:
        tile_chunk = edge_conv._chunk_tiles(em.tile_in.shape[0])
        n_tiles, t = em.tile_in.shape
        n_chunks = -(-n_tiles // tile_chunk)
        pad_t = n_chunks * tile_chunk - n_tiles
        tin = jnp.pad(em.tile_in, ((0, pad_t), (0, 0)),
                      constant_values=-1).reshape(n_chunks, tile_chunk, t)
        tk = jnp.pad(em.tile_k, (0, pad_t),
                     constant_values=-1).reshape(n_chunks, tile_chunk)
        tout = jnp.pad(em.tile_out, ((0, pad_t), (0, 0)),
                       constant_values=-1).reshape(n_chunks, tile_chunk, t)

        def loss_dense(f, w):
            out = edge_conv._conv_scatter_static(out_rows, f, w, tin, tk,
                                                 tout)
            return jnp.sum(out * probe)
    else:
        dense_kmap = jnp.asarray(kmap)

        def loss_dense(f, w):
            out = sparse_conv.sparse_conv(f, w, dense_kmap)
            return jnp.sum(out * probe)

    df_e, dk_e = jax.grad(loss_edge, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(kernel))
    df_d, dk_d = jax.grad(loss_dense, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(df_e), np.asarray(df_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk_e), np.asarray(dk_d),
                               rtol=1e-4, atol=1e-4)


def test_edge_conv_grads_vmapped(rng):
    """Batch-vmapped gradient path: with per-pair edge maps stacked under
    jax.vmap (the training configuration), _live_chunks is a traced bound and
    the streaming backward's fori_loop lowers to a vmapped while_loop — a
    different lowering than the unbatched test above exercises. Per-element
    grads must match the unbatched backward on the same maps."""
    n = m = 160
    k, cin, cout, tile = 27, 5, 7, 32
    b = 2
    kmaps = [_random_kmap(rng, k, m, n, 0.25 + 0.1 * i) for i in range(b)]
    # shared static budget so the stacked maps have equal shapes (exactly how
    # vmapped plan builds produce them)
    live_cap = max(int((km >= 0).sum()) for km in kmaps) + k * tile
    ems = [edge_conv.build_edge_map(jnp.asarray(km), d_cap=27, tile=tile,
                                    live_cap=live_cap) for km in kmaps]
    em_b = jax.tree.map(lambda *xs: jnp.stack(xs), *ems)
    feats = rng.randn(b, n, cin).astype(np.float32)
    kernel = rng.randn(k, cin, cout).astype(np.float32)
    probe = rng.randn(b, m, cout).astype(np.float32)

    def loss_batched(f, w):
        out = jax.vmap(
            lambda ff, ee: edge_conv.sparse_conv_edges(ff, w, ee,
                                                       out_rows=m),
            in_axes=(0, 0))(f, em_b)
        return jnp.sum(out * jnp.asarray(probe))

    df_b, dk_b = jax.jit(jax.grad(loss_batched, argnums=(0, 1)))(
        jnp.asarray(feats), jnp.asarray(kernel))

    dk_sum = np.zeros_like(np.asarray(dk_b))
    for i in range(b):
        def loss_one(f, w):
            out = edge_conv.sparse_conv_edges(f, w, ems[i], out_rows=m)
            return jnp.sum(out * jnp.asarray(probe[i]))

        df_i, dk_i = jax.grad(loss_one, argnums=(0, 1))(
            jnp.asarray(feats[i]), jnp.asarray(kernel))
        np.testing.assert_allclose(np.asarray(df_b[i]), np.asarray(df_i),
                                   rtol=1e-4, atol=1e-4)
        dk_sum += np.asarray(dk_i)
    np.testing.assert_allclose(np.asarray(dk_b), dk_sum,
                               rtol=1e-4, atol=1e-4)


def test_rank_compact_chunked_matches_direct(rng):
    """Wide maps (S > 1024) take the chunked-accumulation path in
    _rank_compact (the direct path materializes a [M, 5, S] digit stack —
    2.1 GB at multimap training scale, the round-4 stage-B OOM). Chunk
    partials land in disjoint one-hot columns, so the result must be
    bit-identical to the direct einsum."""
    m, s, k_total, d_cap = 64, 2500, 729, 16
    kt = rng.randint(0, k_total, size=(m, s)).astype(np.int32)
    it = rng.randint(0, 60000, size=(m, s)).astype(np.int32)
    valid = rng.rand(m, s) < 0.004  # sparse: most rows fit within d_cap

    ek, ei, eo, ov = jax.jit(
        edge_conv._rank_compact, static_argnums=(3, 4))(
        jnp.asarray(kt), jnp.asarray(it), jnp.asarray(valid), k_total, d_cap)

    # numpy oracle: per-row first-d_cap valid (k, in) pairs in column order
    ek = np.asarray(ek).reshape(m, d_cap)
    ei = np.asarray(ei).reshape(m, d_cap)
    any_over = False
    for r in range(m):
        cols = np.nonzero(valid[r])[0]
        any_over |= len(cols) > d_cap
        keep = cols[:d_cap]
        np.testing.assert_array_equal(ei[r, :len(keep)], it[r, keep])
        np.testing.assert_array_equal(ek[r, :len(keep)], kt[r, keep])
        assert (ei[r, len(keep):] == -1).all()
        assert (ek[r, len(keep):] == k_total).all()
    assert bool(ov) == any_over
