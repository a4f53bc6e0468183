import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)
enable_compilation_cache()
select_platform()
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
from demo import synthetic_pair

BASE = dict(
    feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
    inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
    voxel_size=0.05, inlier_feature_type="ones",
    dense_extent="256,256,256", bf16=True)

pairs = [synthetic_pair(n=30000, seed=s) for s in range(4)]

def room_pair(seed, n=30000):
    from scipy.spatial.transform import Rotation
    from deepglobalregistration_tpu.data.synthetic import make_room
    rng = np.random.RandomState(seed)
    xyz0 = make_room(rng, n)
    R = Rotation.from_euler("zyx", [25, 10, -15], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.4, -0.3, 0.2], np.float32)
    xyz1 = (xyz0 @ R.T + t)[rng.permutation(len(xyz0))]
    T = np.eye(4, dtype=np.float32); T[:3, :3] = R; T[:3, 3] = t
    return xyz0, xyz1, T

rooms = [room_pair(s) for s in range(4)]

def drive(tag, dgr, ps):
    t0 = time.time()
    T = dgr.register(ps[0][0], ps[0][1])
    print(f"[{tag}] first pair {time.time()-t0:.1f} s", flush=True)
    t0 = time.time(); reps = 0
    while reps < 6 and (reps < 2 or time.time() - t0 < 60):
        xyz0, xyz1, Tg = ps[reps % len(ps)]
        T = dgr.register(xyz0, xyz1)
        reps += 1
    dt = (time.time() - t0) / reps
    # accuracy of the last pair
    rre = np.rad2deg(np.arccos(np.clip((np.trace(T[:3, :3].T @ Tg[:3, :3]) - 1) / 2, -1, 1)))
    rte = np.linalg.norm(T[:3, 3] - Tg[:3, 3])
    print(f"[{tag}] {dt:.3f} s/pair  rre {rre:.2f} deg  rte {rte*100:.1f} cm", flush=True)
    return dt

cfg_rand = default_config(**BASE)
dgr_rand = DeepGlobalRegistration(cfg_rand)
dt_rand = drive("random-weights/walls", dgr_rand, pairs)

cfg_tw = default_config(weights="weights/fcgf_synthetic.pkl",
                        **{k: v for k, v in BASE.items()})
dgr_tw = DeepGlobalRegistration(cfg_tw)
dt_tw = drive("trained-fcgf/walls", dgr_tw, pairs)
dt_tw_room = drive("trained-fcgf/rooms", dgr_tw, rooms)
dt_rand_room = drive("random-weights/rooms", dgr_rand, rooms)

# voxel-count / bucket check
for tag, (a, b, _) in [("walls", pairs[0]), ("room", rooms[0])]:
    _, c, _ = dgr_rand.preprocess(a)
    print(f"[{tag}] voxels {len(c)}", flush=True)
print("done", flush=True)
