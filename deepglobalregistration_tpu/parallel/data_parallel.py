"""Data parallelism over registration pairs via jax.sharding (SURVEY.md 2.3).

The reference is strictly single-device (no torch.distributed anywhere); this
module is the TPU-native scale-out design obligation: a 1-D 'data' mesh shards
the pair batch; parameters are replicated; XLA GSPMD inserts the gradient psum
and whole-batch BatchNorm reductions over ICI automatically from the sharding
annotations — no hand-written collectives.

Single-chip stays the primary inference path (the benchmark configuration);
this module accelerates training and batched evaluation fan-out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices <= 0:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), axis_names=("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a PairBatch (leading axis = pairs) sharded over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(mesh: Mesh, step_fn, with_lr: bool = False):
    """Wrap a train step in jit with data-sharded batch / replicated params.

    with_lr: the trainer passes the per-epoch learning rate as a 7th traced
    scalar argument (replicated); library/tests call the 6-arg form."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    shardings = (repl, repl, repl, repl, repl,
                 jax.tree.map(lambda _: data, _BATCH_PROTO))
    if with_lr:
        shardings = shardings + (repl,)
    return jax.jit(step_fn, in_shardings=shardings, out_shardings=None)


# PairBatch prototype used only for tree-structure of shardings (values unused).
from ..core.train_step import PairBatch as _PairBatch  # noqa: E402

_BATCH_PROTO = _PairBatch(*([0] * len(_PairBatch._fields)))


def synthetic_pair_batch(rng: np.random.RandomState, b: int, n: int, p: int,
                         voxel: float = 0.05) -> "_PairBatch":
    """Tiny synthetic batch for dry runs and tests."""
    from scipy.spatial.transform import Rotation

    xyz0 = np.zeros((b, n, 3), np.float32)
    xyz1 = np.zeros((b, n, 3), np.float32)
    c0 = np.full((b, n, 3), 32766, np.int32)
    c1 = np.full((b, n, 3), 32766, np.int32)
    n0 = np.zeros(b, np.int32)
    n1 = np.zeros(b, np.int32)
    pos = np.zeros((b, p, 2), np.int32)
    pos_n = np.zeros(b, np.int32)
    T = np.zeros((b, 4, 4), np.float32)
    for i in range(b):
        m = n * 3 // 4
        pts = (rng.rand(m, 3) * (voxel * 20)).astype(np.float32)
        coords = np.floor(pts / voxel).astype(np.int32)
        _, sel = np.unique(coords, axis=0, return_index=True)
        m = len(sel)
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
        t = rng.randn(3).astype(np.float32) * 0.1
        moved = pts[sel] @ R.T + t
        xyz0[i, :m], xyz1[i, :m] = pts[sel], moved
        c0[i, :m] = coords[sel]
        c1[i, :m] = np.floor(moved / voxel).astype(np.int32)
        n0[i] = n1[i] = m
        k = min(p, m)
        pos[i, :k, 0] = pos[i, :k, 1] = np.arange(k)
        pos_n[i] = k
        T[i, :3, :3], T[i, :3, 3], T[i, 3, 3] = R, t, 1.0
    return _PairBatch(*map(jnp.asarray, (xyz0, xyz1, c0, c1, n0, n1, pos, pos_n, T)))


def dryrun_step(n_devices: int) -> None:
    """One full sharded training step on tiny shapes (driver validation hook)."""
    from ..config import default_config
    from ..core import train_step as ts
    from ..models import load_model

    mesh = make_mesh(n_devices)
    config = default_config(feat_model="ResUNetBN2F", feat_model_n_out=8,
                            inlier_model="ResUNetBN2FX", batch_size=n_devices)

    fcgf_spec = load_model(config.feat_model)
    fcgf_cfg = fcgf_spec.make_config(1, config.feat_model_n_out,
                                     conv1_kernel_size=3, normalize_feature=True, D=3)
    inlier_spec = load_model(config.inlier_model)
    inlier_cfg = inlier_spec.make_config(1, 1, conv1_kernel_size=3,
                                         normalize_feature=False, D=6)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    fcgf_params, fcgf_state = fcgf_spec.init(k0, fcgf_cfg)
    inlier_params, inlier_state = inlier_spec.init(k1, inlier_cfg)

    optimizer = ts.make_optimizer("SGD", lambda s: 0.1, config)
    opt_state = optimizer.init(inlier_params)
    step_fn, _ = ts.make_train_step(fcgf_spec, fcgf_cfg, inlier_spec, inlier_cfg,
                                    config, optimizer)

    batch = synthetic_pair_batch(np.random.RandomState(0), b=n_devices, n=256, p=64)
    batch = shard_batch(mesh, batch)
    params_r = replicate(mesh, inlier_params)
    state_r = replicate(mesh, inlier_state)
    opt_r = replicate(mesh, opt_state)
    fp_r = replicate(mesh, fcgf_params)
    fs_r = replicate(mesh, fcgf_state)

    with mesh:
        step = jax.jit(step_fn)
        new_params, new_state, new_opt, stats = step(params_r, state_r, opt_r,
                                                     fp_r, fs_r, batch)
        jax.block_until_ready(new_params)
    loss = float(stats["loss"])
    assert np.isfinite(loss), f"dryrun loss not finite: {loss}"
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(inlier_params), jax.tree.leaves(new_params)))
    assert changed, "dryrun step did not update parameters"
    print(f"dryrun_multichip({n_devices}): loss={loss:.4f} ok")


def dryrun_fanout(n_devices: int) -> None:
    """One mesh-sharded inference fan-out (register_batch) on tiny shapes —
    validates the multi-chip EVAL path (batched vmapped register program,
    batch axis sharded over the 'data' mesh axis) compiles and executes,
    complementing dryrun_step's training coverage (VERDICT r4 #7)."""
    from ..config import default_config
    from ..core.pipeline import DeepGlobalRegistration

    mesh = make_mesh(n_devices)
    config = default_config(
        feat_model="ResUNetBN2F", feat_model_n_out=8,
        inlier_model="ResUNetBN2FX", voxel_size=0.05,
        inlier_feature_type="ones")
    dgr = DeepGlobalRegistration(config)
    rng = np.random.RandomState(0)
    xs, ys = [], []
    for _ in range(n_devices):
        base = rng.rand(600, 3).astype(np.float32) * 1.5
        shift = rng.rand(3).astype(np.float32) * 0.1
        xs.append(base)
        ys.append(base + shift)
    Ts = dgr.register_batch(xs, ys, mesh=mesh)
    assert Ts.shape == (n_devices, 4, 4)
    assert np.all(np.isfinite(np.asarray(Ts))), "fan-out produced non-finite T"
    print(f"dryrun_fanout({n_devices}): {len(xs)} pairs ok")
