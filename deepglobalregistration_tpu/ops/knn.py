"""Feature-space nearest-neighbor search as a tiled on-device distance scan.

TPU-native replacement for core/knn.py:23-74 (chunked brute-force pairwise
distances). Instead of materializing the [N0, N1] distance matrix (the reference
bounds memory by `nn_max_n` row chunks), we stream column tiles of F1 through a
running-min scan — flash-attention-style: per tile, one [N0, C] x [C, tile]
matmul on the MXU plus a masked min/argmin update. Peak memory is O(N0 * tile).

Padded rows (>= num) are excluded on both sides: invalid queries return index 0
with +inf distance; invalid targets never win the min.

Precision: the cross-term matmul runs at float32 MXU precision
(``Precision.HIGHEST``) by default. With the TPU's default bf16 MXU passes the
expansion ``|a|^2 - 2 a.b + |b|^2`` cancels catastrophically (observed ~0.02
absolute error on *exact* matches, which breaks argmin ties and near-neighbor
ordering). The distance matmul is a tiny fraction of pipeline FLOPs, so f32
here is essentially free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 4096
_INF = np.float32(np.inf)  # numpy: avoid backend init at import


def pallas_ok() -> bool:
    """Whether the fused Pallas 1-NN kernel should be used (direct-attached
    TPU backends only). vmap over the kernel is supported (jax batches
    pallas_call by prepending a grid axis; register_batch's match stage uses
    it, equality-tested against register()), but callers should keep
    use_pallas=False for vmapped calls nested in while_loops (e.g. the ICP
    full scan) — that combination is unvalidated on hardware.

    Excluded on the tunneled 'axon' backend: Mosaic custom-call dispatches
    there pay a content-dependent cost that scales with input entropy —
    measured 86 ms per (16384, 32) call on random features vs 0.7 ms on
    compressible inputs (tools/nn_bench.py chained timings; the XLA scan path
    runs the same shape in ~4 ms flat). Override with DGR_FORCE_PALLAS=1.
    """
    import os as _os

    import jax as _j

    if _os.environ.get("DGR_FORCE_PALLAS") == "1":
        return True
    if _j.default_backend() != "tpu":
        return False
    # The axon plugin reports platform 'tpu'; only platform_version names it.
    ver = getattr(_j.devices()[0].client, "platform_version", "")
    return "axon" not in ver


def find_nn(F0: jnp.ndarray, F1: jnp.ndarray, num0: jnp.ndarray, num1: jnp.ndarray,
            tile: int = _TILE, use_pallas: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-nearest-neighbor of each F0 row among valid F1 rows (squared L2).

    F0: [N0, C], F1: [N1, C]. Returns (idx [N0] int32, sqdist [N0] f32).
    use_pallas: route to the fused Pallas kernel (ops/pallas_knn.py) — only
    from non-vmapped TPU call sites.
    """
    if use_pallas:
        from . import pallas_knn

        return pallas_knn.find_nn_pallas(F0, F1, num0, num1)
    n0, c = F0.shape
    n1 = F1.shape[0]
    tile = min(tile, n1)
    n_tiles = -(-n1 // tile)
    pad_n1 = n_tiles * tile
    F1p = jnp.pad(F1, ((0, pad_n1 - n1), (0, 0)))
    F1t = F1p.reshape(n_tiles, tile, c)

    sq0 = jnp.sum(F0.astype(jnp.float32) ** 2, axis=1)  # [N0]

    def body(carry, inputs):
        best_d, best_i = carry
        f1_tile, tile_start = inputs
        sq1 = jnp.sum(f1_tile.astype(jnp.float32) ** 2, axis=1)  # [tile]
        cross = jnp.dot(F0, f1_tile.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d = sq0[:, None] - 2.0 * cross + sq1[None, :]
        col = tile_start + jnp.arange(tile, dtype=jnp.int32)[None, :]
        d = jnp.where(col < num1, d, _INF)
        tmin = jnp.min(d, axis=1)
        targ = jnp.argmin(d, axis=1).astype(jnp.int32) + tile_start
        upd = tmin < best_d
        return (jnp.where(upd, tmin, best_d), jnp.where(upd, targ, best_i)), None

    init = (jnp.full((n0,), _INF), jnp.zeros((n0,), jnp.int32))
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (best_d, best_i), _ = jax.lax.scan(body, init, (F1t, starts))
    q_valid = jnp.arange(n0, dtype=jnp.int32) < num0
    return jnp.where(q_valid, best_i, 0), jnp.where(q_valid, best_d, _INF)


def find_knn(F0: jnp.ndarray, F1: jnp.ndarray, num0: jnp.ndarray, num1: jnp.ndarray,
             k: int, tile: int = _TILE) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-nearest-neighbors (squared L2), ascending by distance.

    Merges per-tile top-k with the running top-k (total work one extra sort of
    2k candidates per row per tile). Returns (idx [N0, k], sqdist [N0, k]).
    """
    n0, c = F0.shape
    n1 = F1.shape[0]
    tile = max(min(tile, n1), k)
    n_tiles = -(-n1 // tile)
    pad_n1 = n_tiles * tile
    F1p = jnp.pad(F1, ((0, pad_n1 - n1), (0, 0)))
    F1t = F1p.reshape(n_tiles, tile, c)
    sq0 = jnp.sum(F0.astype(jnp.float32) ** 2, axis=1)

    def body(carry, inputs):
        best_d, best_i = carry  # [N0, k]
        f1_tile, tile_start = inputs
        sq1 = jnp.sum(f1_tile.astype(jnp.float32) ** 2, axis=1)
        cross = jnp.dot(F0, f1_tile.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d = sq0[:, None] - 2.0 * cross + sq1[None, :]
        col = tile_start + jnp.arange(tile, dtype=jnp.int32)[None, :]
        d = jnp.where(col < num1, d, _INF)
        td, ti = jax.lax.top_k(-d, k)
        cand_d = jnp.concatenate([best_d, -td], axis=1)  # [N0, 2k]
        cand_i = jnp.concatenate([best_i, ti.astype(jnp.int32) + tile_start], axis=1)
        md, mpos = jax.lax.top_k(-cand_d, k)
        return (-md, jnp.take_along_axis(cand_i, mpos, axis=1)), None

    init = (jnp.full((n0, k), _INF), jnp.zeros((n0, k), jnp.int32))
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (best_d, best_i), _ = jax.lax.scan(body, init, (F1t, starts))
    q_valid = (jnp.arange(n0, dtype=jnp.int32) < num0)[:, None]
    return jnp.where(q_valid, best_i, 0), jnp.where(q_valid, best_d, _INF)


def find_nn_xyz(xyz0: jnp.ndarray, xyz1: jnp.ndarray, num0: jnp.ndarray,
                num1: jnp.ndarray, tile: int = _TILE) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial 1-NN (used by ICP and GT correspondence checks); same scan over 3D."""
    return find_nn(xyz0, xyz1, num0, num1, tile=tile)


# Batched over pairs: the reference's find_knn_batch (core/knn.py:77-140) loops
# per-pair segments; here pairs are stacked [B, N, C] and vmapped.
find_nn_batch = jax.vmap(find_nn, in_axes=(0, 0, 0, 0))


def find_knn_cpu(feat0, feat1, knn: int = 1, return_distance: bool = False):
    """Host-side KD-tree k-NN (core/knn.py:14-20 find_knn_cpu; the
    knn_search_method='cpu' config path). numpy in/out."""
    import numpy as np
    from scipy.spatial import cKDTree

    dists, nn_inds = cKDTree(np.asarray(feat1)).query(np.asarray(feat0), k=knn)
    if return_distance:
        return nn_inds, dists
    return nn_inds
