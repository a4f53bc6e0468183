"""Benchmark-script coverage over synthetic on-disk fixtures (no real datasets)."""

import jax
import numpy as np
import torch.utils.data

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.data.threedmatch import ThreeDMatchTrajectoryDataset
from deepglobalregistration_tpu.utils.pointcloud import write_point_cloud
from scripts.analyze_stats import recall_curves, summarize
from scripts.test_3dmatch import evaluate, rte_rre


class _OracleMethod:
    """Stub registration method returning the exact ground truth."""

    def __init__(self):
        self.calls = 0

    def register(self, xyz0, xyz1):
        self.calls += 1
        # the evaluate loop compares against inv(trans); our trans is identity
        return np.eye(4)


def _make_trajectory_root(tmp_path, rng, scene="scene-a", n_pairs=3):
    root = tmp_path / "3dm"
    (root / scene).mkdir(parents=True)
    (root / f"{scene}-evaluation").mkdir()
    lines = []
    for p in range(n_pairs):
        for k in (p, p + 1):
            ply = root / scene / f"cloud_bin_{k}.ply"
            if not ply.exists():
                write_point_cloud(ply, rng.rand(200, 3).astype(np.float32))
        lines.append(f"{p} {p+1} {n_pairs+1}\n" + "\n".join(
            " ".join(str(float(v)) for v in row) for row in np.eye(4)) + "\n")
    (root / f"{scene}-evaluation" / "gt.log").write_text("".join(lines))
    split = tmp_path / "split.txt"
    split.write_text(scene + "\n")
    return root, split


def test_rte_rre_criterion():
    T = np.eye(4)
    ok = rte_rre(T, T, 0.3, 15)
    assert ok[0] == 1 and ok[1] < 1e-9
    T2 = np.eye(4)
    T2[:3, 3] = [1, 0, 0]
    assert rte_rre(T2, T, 0.3, 15)[0] == 0
    assert rte_rre(None, T, 0.3, 15)[0] == 0


def test_evaluate_loop_and_stats(tmp_path, rng):
    root, split = _make_trajectory_root(tmp_path, rng)
    config = default_config(threed_match_dir=str(root), out_dir=str(tmp_path / "out"))
    ThreeDMatchTrajectoryDataset.DATA_FILES = dict(
        ThreeDMatchTrajectoryDataset.DATA_FILES, test=str(split))
    dset = ThreeDMatchTrajectoryDataset(phase="test", random_scale=False,
                                        random_rotation=False, config=config)
    loader = torch.utils.data.DataLoader(dset, batch_size=1, shuffle=False,
                                         collate_fn=lambda x: x)
    method = _OracleMethod()
    stats = evaluate([method], ["oracle"], loader, config)
    assert method.calls == 3
    assert stats.shape == (1, 3, 5)
    assert (stats[0, :, 0] == 1).all()  # oracle always succeeds
    assert (tmp_path / "out" / "3dmatch-stats.npz").exists()

    # analyze_stats consumes the schema
    summarize(stats, ["oracle"])
    rte_grid, rre_grid, curves = recall_curves(stats, ["oracle"])
    assert curves["oracle"][0][-1] == 1.0  # full recall at the loosest threshold


def test_bench_weights_checkpoint_committed():
    """The committed bench weights (weights/fcgf_synthetic.pkl, loaded by
    bench.py when present) must stay loadable and stamp the exact network
    config the bench pipeline expects — a drifted or corrupt file would
    silently flip the driver benchmark back to random weights."""
    from pathlib import Path

    from deepglobalregistration_tpu.utils import checkpoint as ckpt_utils

    path = Path(__file__).resolve().parent.parent / "weights" / "fcgf_synthetic.pkl"
    assert path.exists(), "bench weights missing (tools/export_bench_weights.py)"
    state = ckpt_utils.load_checkpoint(path)
    cfg = state["config"]
    assert cfg["feat_model"] == "ResUNetBN2C"
    assert cfg["feat_model_n_out"] == 32
    assert cfg["feat_conv1_kernel_size"] == 7
    assert cfg["voxel_size"] == 0.05
    assert cfg["normalize_feature"] is True
    assert state.get("state_dict_inlier") is None  # feature-only by design
    params = state["state_dict"]["params"]
    assert len(jax.tree.leaves(params)) > 10  # a real ResUNet tree
