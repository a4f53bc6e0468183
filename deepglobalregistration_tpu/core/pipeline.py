"""DeepGlobalRegistration — the end-to-end inference pipeline (product API).

Rebuilds core/deep_global_registration.py:67-324 TPU-first. The reference's
stages (voxelize -> FCGF features -> 1-NN feature matching -> 6D inlier net ->
weighted Procrustes + SE(3) refinement, safeguard RANSAC, final ICP) map onto
three jitted device programs per padded bucket size plus one scalar host sync
for the weighted-sum safeguard gate (reference gate: deep_global_registration
.py:276-281):

  stage A (per pair): quantize both clouds + batched FCGF forward (B=2 on one
          coordinate batch, mirroring ME's batched sparse tensor)
  stage B: tiled 1-NN matching + 6D inlier net -> clipped sigmoid weights
  stage C: branch — weighted Procrustes + refinement loop (while_loop) OR
          vectorized RANSAC — then ICP polish, all on device.

Static-shape policy: raw clouds pad to a bucket from ``point_buckets``; the
voxelized clouds re-bucket after a host read of the voxel counts (one extra
sync, saves compiling the network at raw-cloud capacity). Compiled programs
are cached per bucket by jax.jit.

Public API preserved: ``DeepGlobalRegistration(config).register(xyz0, xyz1)``
returns a 4x4 numpy transform taking xyz0 into xyz1's frame.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import load_model
from ..ops import icp as icp_ops
from ..ops import knn, ransac, se3, sparse_grid
from ..ops.sparse_grid import Grid
from ..utils import checkpoint as ckpt_utils
from ..utils.timer import Timer
from . import registration

log = logging.getLogger(__name__)

_DEFAULT_BUCKETS = (8192, 16384, 32768, 65536, 131072)

# Bucket capacity at which the ICP polish switches from the full per-
# iteration spatial scan (O(N0*N1) but only ~7 ms at 16k x 16k) to candidate
# lists (O(N) per iteration after a ~41 ms build) — tools/icp_probe.py.
# 'auto' keys on the PADDED bucket capacity, not the actual voxel count
# (the choice must be trace-static, and the probe data was measured per
# bucket): a sparse pair landing just inside a >=32k bucket pays the
# candidate build where a count-based rule might pick the scan, but stays
# within ~2x of optimal; re-bucketing by count would re-trace per count.
_ICP_CAND_MIN_CAP = 32768


def _bucket_for(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"cloud with {n} points exceeds the largest bucket {buckets[-1]}")


def _pad_cloud(xyz: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros((cap, 3), np.float32)
    out[: len(xyz)] = xyz
    return out


class DeepGlobalRegistration:
    """Pairwise registration pipeline with the reference's public surface.

    Construction mirrors deep_global_registration.py:67-132: the checkpoint's
    embedded config decides voxel size, model names and inlier feature type.
    For from-scratch use (no checkpoint), pass ``params`` trees directly.
    """

    def __init__(self, config, device=None):
        self.config = config
        self.clip_weight_thresh = config.clip_weight_thresh
        self.safeguard_method = "correspondence"  # | "feature_matching"
        self.use_icp = True
        self.feat_timer = Timer()
        self.reg_timer = Timer()
        # Cumulative count of register()/register_many() pairs whose plans
        # dropped kernel-map entries (3D or 6D overflow) — exactness telemetry
        # for callers (bench.py fails loud on a nonzero count).
        self.overflow_count = 0
        self.buckets = tuple(int(b) for b in str(
            getattr(config, "point_buckets", "")).split(",") if b) or _DEFAULT_BUCKETS
        self.level_shrink = int(getattr(config, "level_shrink", 2))
        # 6D correspondence grids barely merge under stride-down (outlier rows
        # scatter in 6D), so the inlier pyramid keeps full capacity by default
        # — edge-compacted convs make deep-level capacity cheap (FLOPs track
        # edges, not capacity).
        self.level_shrink_6d = int(getattr(config, "level_shrink_6d", 1))
        de = str(getattr(config, "dense_extent", "") or "")
        self.dense_extent = tuple(int(x) for x in de.split(",")) if de else None
        self.ransac_hypotheses = int(getattr(config, "ransac_hypotheses", 16384))
        # bf16 conv compute (f32 accumulation + f32 feature normalization /
        # solvers): the MXU's native dtype — ~4x f32 matmul throughput on v5e.
        self.compute_dtype = jnp.bfloat16 if getattr(config, "bf16", False) \
            else jnp.float32
        # 'gpu' = on-device tiled scan; 'cpu' = host cKDTree (reference
        # find_knn_batch dispatch, core/knn.py:77-103).
        self.knn_search_method = str(getattr(config, "knn_search_method", "gpu"))
        # Cold-start knob: route register() through the per-stage jits (each
        # compiles separately, far faster than the single fused program) at
        # the cost of ~4 extra dispatch round trips per pair.
        self.split_register = bool(getattr(config, "split_register", False))
        # 6D edge budget/cap multiplier for clouds denser than the bench
        # shape (config --edge_budget_scale; models/unet_plan.py docstring).
        self.edge_budget_scale = float(getattr(config, "edge_budget_scale",
                                               1.0) or 1.0)
        self._rng = jax.random.PRNGKey(0)
        self._net_cap_guess = None  # speculative bucket (see register())
        self._staged_inlier_jit = None  # lazy jit caches for the staged API
        self._staged_ransac_jit = None

        if getattr(config, "weights", None):
            state = ckpt_utils.load_torch_checkpoint(config.weights) \
                if str(config.weights).endswith((".pth", ".pt")) \
                else ckpt_utils.load_checkpoint(config.weights)
            network_config = state["config"]
            get = (network_config.get if isinstance(network_config, dict)
                   else partial(getattr, network_config))
            self.voxel_size = get("voxel_size")
            self.inlier_feature_type = get("inlier_feature_type")
            feat_model = get("feat_model") if _has(network_config, "feat_model") else get("model")
            feat_n_out = get("feat_model_n_out") if _has(network_config, "feat_model_n_out") \
                else get("model_n_out")
            feat_k1 = get("feat_conv1_kernel_size") if _has(network_config, "feat_conv1_kernel_size") \
                else get("conv1_kernel_size")
            self.fcgf_spec = load_model(feat_model)
            self.fcgf_cfg = self.fcgf_spec.make_config(
                1, feat_n_out, bn_momentum=get("bn_momentum"),
                conv1_kernel_size=feat_k1, normalize_feature=get("normalize_feature"), D=3)
            if "fcgf_params" in state:
                self.fcgf_params, self.fcgf_state = state["fcgf_params"], state["fcgf_state"]
            else:
                self.fcgf_params = state["state_dict"]["params"]
                self.fcgf_state = state["state_dict"]["state"]
            inlier_in = 6 if self.inlier_feature_type == "coords" else \
                (2 * feat_n_out if self.inlier_feature_type == "feats" else 1)
            self.inlier_spec = load_model(get("inlier_model"))
            self.inlier_cfg = self.inlier_spec.make_config(
                inlier_in, 1, bn_momentum=get("bn_momentum"),
                conv1_kernel_size=get("inlier_conv1_kernel_size"),
                normalize_feature=False, D=6)
            if "inlier_params" in state:
                self.inlier_params, self.inlier_state = state["inlier_params"], state["inlier_state"]
                self.inlier_trained = True
            elif state.get("state_dict_inlier") is not None:
                si = state["state_dict_inlier"]
                self.inlier_params, self.inlier_state = si["params"], si["state"]
                self.inlier_trained = True
            else:
                # Feature-only checkpoint (e.g. a converted FCGF .pth, or the
                # trainer's stage-A bootstrap weights): random-init the 6D
                # inlier net, mirroring the trainer's own bootstrap
                # (core/trainer.py loads config.weights as FCGF-only).
                # inlier_trained lets callers (bench, demo) label the config
                # honestly — the learned gate is untrained in this mode.
                self.inlier_params, self.inlier_state = self.inlier_spec.init(
                    jax.random.PRNGKey(1), self.inlier_cfg)
                self.inlier_trained = False
        else:
            # From-scratch initialization (used by tests / training bootstrap).
            self.voxel_size = config.voxel_size
            self.inlier_feature_type = config.inlier_feature_type
            self.fcgf_spec = load_model(config.feat_model)
            self.fcgf_cfg = self.fcgf_spec.make_config(
                1, config.feat_model_n_out, bn_momentum=config.bn_momentum,
                conv1_kernel_size=config.feat_conv1_kernel_size,
                normalize_feature=config.normalize_feature, D=3)
            k0, k1 = jax.random.split(jax.random.PRNGKey(0))
            self.fcgf_params, self.fcgf_state = self.fcgf_spec.init(k0, self.fcgf_cfg)
            inlier_in = 6 if config.inlier_feature_type == "coords" else \
                (2 * config.feat_model_n_out if config.inlier_feature_type == "feats" else 1)
            self.inlier_spec = load_model(config.inlier_model)
            self.inlier_cfg = self.inlier_spec.make_config(
                inlier_in, 1, bn_momentum=config.bn_momentum,
                conv1_kernel_size=config.inlier_conv1_kernel_size,
                normalize_feature=False, D=6)
            self.inlier_params, self.inlier_state = self.inlier_spec.init(k1, self.inlier_cfg)
            self.inlier_trained = False

        # Inference-only BN folding (utils/fold_bn.py; SURVEY.md 7.3 cheap win).
        if getattr(config, "fold_bn", True):
            from ..utils.fold_bn import fold_batch_norms

            self.fcgf_params, self.fcgf_state, self.fcgf_cfg = fold_batch_norms(
                self.fcgf_params, self.fcgf_state, self.fcgf_cfg)
            self.inlier_params, self.inlier_state, self.inlier_cfg = fold_batch_norms(
                self.inlier_params, self.inlier_state, self.inlier_cfg)

        self.fcgf_params = jax.tree.map(jnp.asarray, self.fcgf_params)
        self.fcgf_state = jax.tree.map(jnp.asarray, self.fcgf_state)
        self.inlier_params = jax.tree.map(jnp.asarray, self.inlier_params)
        self.inlier_state = jax.tree.map(jnp.asarray, self.inlier_state)
        self._build_jits()

    # ------------------------------------------------------------------
    # jitted stages
    # ------------------------------------------------------------------
    def _build_jits(self):
        voxel = float(self.voxel_size)
        fcgf_spec, fcgf_cfg = self.fcgf_spec, self.fcgf_cfg
        inlier_spec, inlier_cfg = self.inlier_spec, self.inlier_cfg
        shrink = self.level_shrink
        shrink6 = self.level_shrink_6d
        # Fused Pallas 1-NN on TPU for the non-vmapped single-pair stages
        # (matching, ICP, feature-matching safeguard); the vmapped batch path
        # keeps the scan formulation.
        use_pallas = knn.pallas_ok()

        @jax.jit
        def quantize(xyz_pair, nums):
            """xyz_pair [2, Nraw, 3] -> selected points + voxel grids (same cap)."""
            xyz_sel, grids = jax.vmap(lambda x, n: sparse_grid.voxelize(x, n, voxel))(
                xyz_pair, nums)
            return xyz_sel, grids

        dense_extent = self.dense_extent

        def features_core(fcgf_params, fcgf_state, grids):
            """Batched (B=2) FCGF forward on pre-bucketed voxel grids.

            Also returns the plan's overflow flag (dropped kernel-map entries:
            hash probe-window or --dense_extent box violation) so register()
            can warn at its existing host sync instead of degrading silently."""
            plan = jax.vmap(fcgf_spec.build_plan,
                            in_axes=(0, None, None, None, None))(
                grids, fcgf_cfg, shrink, dense_extent, True)
            feats = jnp.ones(grids.coords.shape[:2] + (1,), self.compute_dtype)
            out, _ = fcgf_spec.apply(fcgf_params, fcgf_state, fcgf_cfg, plan, feats,
                                     train=False)
            return out.astype(jnp.float32), jnp.any(plan.overflow)

        @jax.jit
        def features(fcgf_params, fcgf_state, grids, nvox):
            return features_core(fcgf_params, fcgf_state, grids)

        def match_inlier_core(feats0, feats1, xyz0, xyz1,
                              coords0, coords1, num0, num1,
                              inlier_params=None, inlier_state=None,
                              idx1=None, pallas=False):
            """1-NN matching + 6D inlier prediction -> clipped weights + wsum.

            Mirrors deep_global_registration.py:171-272: corres_idx0 = arange,
            corres_idx1 = feature 1-NN, 6D coords = concat, feature type 'ones' |
            'feats' | 'coords', sigmoid + clip at clip_weight_thresh.
            idx1: precomputed matches (the knn_search_method='cpu' host path,
            core/knn.py:77-103 dispatch); None = on-device tiled scan ('gpu').
            """
            if inlier_params is None:
                inlier_params, inlier_state = self.inlier_params, self.inlier_state
            if idx1 is None:
                idx1, _ = knn.find_nn(feats0, feats1, num0, num1,
                                      use_pallas=pallas)
            c0, c1 = coords0, coords1[idx1]
            coords6 = jnp.concatenate([c0, c1], axis=1)
            grid6 = Grid(coords=coords6, num=num0)
            if self.inlier_feature_type == "ones":
                ifeat = jnp.ones((coords6.shape[0], 1), self.compute_dtype)
            elif self.inlier_feature_type == "feats":
                ifeat = jnp.concatenate([feats0, feats1[idx1]], axis=1)
            elif self.inlier_feature_type == "coords":
                ifeat = jnp.concatenate([jnp.cos(xyz0), jnp.cos(xyz1[idx1])], axis=1)
            else:
                raise TypeError(f"undefined inlier feature type {self.inlier_feature_type}")
            ifeat = ifeat.astype(self.compute_dtype)
            # The paired fast path builds the heavy level-0 6D maps via 3D
            # lookups (ops/paired_kernel_map.py); pyramid nets and SP variants
            # need extra map kinds and use the generic builder.
            from ..models import unet_plan as up

            if hasattr(inlier_cfg, "family") and not inlier_cfg.family.startswith("sp"):
                plan = up.build_paired_unet_plan(
                    c0, c1, num0, inlier_cfg.conv1_kernel_size,
                    inlier_cfg.region_type, inlier_cfg.levels, shrink6,
                    dense_extent=dense_extent,
                    budget_scale=self.edge_budget_scale)
                plan = jax.tree.map(lambda x: x[None], plan)
            else:
                plan = jax.vmap(inlier_spec.build_plan, in_axes=(0, None, None))(
                    jax.tree.map(lambda x: x[None], grid6), inlier_cfg, shrink6)
            logits, _ = inlier_spec.apply(inlier_params, inlier_state, inlier_cfg,
                                          plan, ifeat[None], train=False)
            w = jax.nn.sigmoid(logits[0, :, 0].astype(jnp.float32))
            valid = jnp.arange(w.shape[0], dtype=jnp.int32) < num0
            if self.clip_weight_thresh > 0:
                w = jnp.where(w < self.clip_weight_thresh, 0.0, w)
            w = jnp.where(valid, w, 0.0)
            return idx1, w, jnp.sum(w), jnp.any(plan.overflow)

        @jax.jit
        def match_and_inlier(inlier_params, inlier_state, feats0, feats1, xyz0, xyz1,
                             coords0, coords1, num0, num1):
            return match_inlier_core(feats0, feats1, xyz0, xyz1, coords0, coords1,
                                     num0, num1, inlier_params, inlier_state,
                                     pallas=use_pallas)

        @jax.jit
        def inlier_from_idx(inlier_params, inlier_state, idx1, feats0, feats1,
                            xyz0, xyz1, coords0, coords1, num0, num1):
            """Inlier stage with host-computed matches (knn_search_method='cpu')."""
            return match_inlier_core(feats0, feats1, xyz0, xyz1, coords0, coords1,
                                     num0, num1, inlier_params, inlier_state,
                                     idx1=idx1)

        @jax.jit
        def refine(xyz0_corr, xyz1_corr, weights):
            res = registration.global_registration(
                xyz0_corr, xyz1_corr, weights,
                break_threshold_ratio=1e-4, quantization_size=2 * voxel)
            return res.R, res.t

        @jax.jit
        def safeguard(key, xyz0_corr, xyz1_corr, num):
            res = ransac.ransac_correspondence(
                key, xyz0_corr, xyz1_corr, num, distance_threshold=2 * voxel,
                num_hypotheses=self.ransac_hypotheses)
            return res.R, res.t

        @jax.jit
        def safeguard_feat(key, xyz0, xyz1, feats0, feats1, num0, num1):
            res = ransac.ransac_feature_matching(
                key, xyz0, xyz1, feats0, feats1, num0, num1,
                distance_threshold=2 * voxel,
                num_hypotheses=self.ransac_hypotheses,
                use_pallas=use_pallas)
            return res.R, res.t

        # ICP neighbor strategy per (static) bucket capacity: the full tiled
        # spatial scan costs ~7 ms/iteration at 16k x 16k while the candidate-
        # list BUILD alone costs ~41 ms (tools/icp_probe.py, round 4) — so at
        # bench scale the full scan wins outright (21 vs 43 ms near-converged,
        # 59 vs 97 ms coarse) AND is exact for any init (no staleness rerun).
        # The scan is O(N0*N1) though, so candidate lists still win above
        # ~32k points; 'auto' switches on the traced capacity.
        icp_mode = str(getattr(self.config, "icp_candidates", "auto"))
        if icp_mode not in ("auto", "on", "off"):
            # config may come from a checkpoint-embedded dict, bypassing the
            # argparse choices guard; a typo must not silently force the
            # O(N^2) full scan at 65k-point buckets. Eager: fail at
            # construction, not first trace.
            raise ValueError(
                f"icp_candidates must be auto|on|off, got {icp_mode!r}")

        def use_cand_for(cap: int) -> bool:
            if icp_mode == "auto":
                return cap >= _ICP_CAND_MIN_CAP
            return icp_mode == "on"

        def icp_polish_core(xyz0, xyz1, num0, num1, T):
            if use_cand_for(xyz0.shape[0]):
                res = icp_ops.registration_icp_checked(
                    xyz0, xyz1, num0, num1,
                    max_correspondence_distance=2 * voxel,
                    init=T, use_pallas=use_pallas)
            else:
                res = icp_ops.registration_icp(
                    xyz0, xyz1, num0, num1,
                    max_correspondence_distance=2 * voxel,
                    init=T, use_pallas=use_pallas, use_candidates=False)
            return res.T, res.cand_ok

        @jax.jit
        def icp_polish(xyz0, xyz1, num0, num1, T):
            return icp_polish_core(xyz0, xyz1, num0, num1, T)

        @jax.jit
        def register_fused(fcgf_params, fcgf_state, inlier_params,
                           inlier_state, rng, xyz_sel, grids):
            """Everything after voxelization as ONE device program.

            The staged path pays one tunnel/dispatch round trip per stage
            (features, match+inlier, refine|ransac, icp — tens of ms each on
            this platform); here the safeguard gate is a lax.cond (one branch
            executes on TPU, like the reference's host branch at
            deep_global_registration.py:276-315) and the RNG split for the
            safeguard lives on device, so register() makes a single dispatch
            and a single result sync."""
            rng_next, key = jax.random.split(rng)
            feats, overflow3 = features_core(fcgf_params, fcgf_state, grids)
            idx1, weights, wsum, overflow6 = match_inlier_core(
                feats[0], feats[1], xyz_sel[0], xyz_sel[1],
                grids.coords[0], grids.coords[1], grids.num[0], grids.num[1],
                inlier_params, inlier_state, pallas=use_pallas)
            xyz0_corr = xyz_sel[0]
            xyz1_corr = xyz_sel[1][idx1]
            thresh = jnp.maximum(200.0, 0.05 * grids.num[0].astype(jnp.float32))

            def do_refine(op):
                x0c, x1c, w, _ = op
                res = registration.global_registration(
                    x0c, x1c, w, break_threshold_ratio=1e-4,
                    quantization_size=2 * voxel)
                return res.R, res.t

            def do_ransac(op):
                x0c, x1c, _, k = op
                res = ransac.ransac_correspondence(
                    k, x0c, x1c, grids.num[0], distance_threshold=2 * voxel,
                    num_hypotheses=self.ransac_hypotheses)
                return res.R, res.t

            R, t = jax.lax.cond(wsum >= thresh, do_refine, do_ransac,
                                (xyz0_corr, xyz1_corr, weights, key))
            T = se3.rt_to_matrix(R, t)
            cand_ok = jnp.bool_(True)
            if self.use_icp:
                # Capacity-dependent neighbor strategy (see icp_polish_core);
                # when the candidate path is chosen, the checked wrapper
                # reruns the full scan on device if the init drifts past the
                # quarter-cell exactness bound (safeguard inits can be
                # decimeters off).
                T, cand_ok = icp_polish_core(
                    xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1], T)
            return T, wsum, overflow3, overflow6, cand_ok, rng_next

        # ------------------------------------------------------------------
        # batched / multi-chip registration (eval fan-out; SURVEY.md 2.3)
        # ------------------------------------------------------------------
        def register_pair_device(fcgf_params, fcgf_state, inlier_params,
                                 inlier_state, xyz_sel, grids):
            """One PRE-VOXELIZED pair end-to-end on device (vmap/shard-ready).

            Voxelization runs in a separate vmapped phase so the host can
            re-bucket the batch to the voxel-count capacity before this heavy
            program runs (at 3DMatch scale the raw bucket is 2x the voxel
            bucket — running the nets there doubled every stage and ran the
            batch out of HBM at B=8). Unlike register(), the safeguard gate
            cannot branch per pair inside the batch (lax.cond under vmap runs
            both sides), so this program computes the REFINEMENT answer only
            and returns the gate scalar: register_batch reruns the rare
            gate-failing pairs through the sequential fused path, whose
            lax.cond executes RANSAC for real — a two-pass structure that
            spares the ~95% of pairs that pass the gate the full 16384-
            hypothesis RANSAC the round-2 batch path paid unconditionally.
            Params are ARGUMENTS (not closure constants) so one compiled
            executable serves updated weights without retracing.
            """
            plan = jax.vmap(fcgf_spec.build_plan,
                            in_axes=(0, None, None, None, None))(
                grids, fcgf_cfg, shrink, dense_extent, True)
            feats_in = jnp.ones(grids.coords.shape[:2] + (1,), self.compute_dtype)
            feats, _ = fcgf_spec.apply(fcgf_params, fcgf_state, fcgf_cfg, plan,
                                       feats_in, train=False)
            feats = feats.astype(jnp.float32)
            # pallas: same 1-NN kernel as the sequential fused path — the XLA
            # scan fallback is both slower and tie-breaks differently (which
            # showed up as cm-scale pose diffs between batch and register()).
            idx1, weights, wsum, _ = match_inlier_core(
                feats[0], feats[1], xyz_sel[0], xyz_sel[1],
                grids.coords[0], grids.coords[1], grids.num[0], grids.num[1],
                inlier_params, inlier_state, pallas=use_pallas)

            xyz0_corr = xyz_sel[0]
            xyz1_corr = xyz_sel[1][idx1]
            res = registration.global_registration(
                xyz0_corr, xyz1_corr, weights,
                break_threshold_ratio=1e-4, quantization_size=2 * voxel)
            T = se3.rt_to_matrix(res.R, res.t)
            cand_ok = jnp.bool_(True)
            if self.use_icp:
                # Same capacity rule as icp_polish_core, but never the checked
                # wrapper: lax.cond under vmap runs BOTH branches, so the
                # fallback would cost a full scan for every pair. When the
                # candidate path is chosen (large caps), cand_ok is surfaced
                # and register_batch reruns stale pairs sequentially.
                # use_pallas=False: the full-scan path's fused 1-NN inside
                # ICP's while_loop is unvalidated under vmap on hardware
                # (unlike the match stage's direct batched call above); the
                # XLA scan find is exact either way.
                icp_res = icp_ops.registration_icp(
                    xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1],
                    max_correspondence_distance=2 * voxel, init=T,
                    use_pallas=False,
                    use_candidates=use_cand_for(xyz_sel.shape[1]))
                T, cand_ok = icp_res.T, icp_res.cand_ok
            thresh = jnp.maximum(200.0, 0.05 * grids.num[0].astype(jnp.float32))
            return T, (wsum >= thresh) & cand_ok

        self._quantize = quantize
        self._features = features
        self._register_fused = register_fused
        self._match_and_inlier = match_and_inlier
        self._inlier_from_idx = inlier_from_idx
        self._match_inlier_core = match_inlier_core
        self._refine = refine
        self._safeguard = safeguard
        self._safeguard_feat = safeguard_feat
        self._icp_polish = icp_polish
        # Built ONCE: re-jitting per register_batch call would re-trace (and
        # bake the params in) every invocation — minutes of compile latency on
        # this platform per eval fan-out call.
        self._quantize_batch = jax.jit(jax.vmap(quantize))
        self._register_batch_jit = jax.jit(jax.vmap(
            register_pair_device,
            in_axes=(None, None, None, None, 0, 0)))

    # Per-dispatch pair cap for register_batch on ONE chip: the deep 6D
    # plan builds materialize ~1.2 GB of digit-matmul buffers per pair at the
    # 16384 bucket (edge_conv._rank_compact [M, 5, S] at level-3 multimap
    # width), so B=8 in one program exceeds v5e HBM (measured 17.3 G > 15.75 G
    # at bench scale). Sub-batches dispatch asynchronously — device execution
    # still overlaps host prep — so throughput keeps the batching win.
    _MAX_SUB_BATCH = 4

    def register_batch(self, xyz0_list, xyz1_list, mesh=None,
                       force_vmapped: bool = False) -> np.ndarray:
        """Register many pairs; returns [B, 4, 4] transforms.

        Single chip (``mesh=None``): delegates to the pipelined stream
        (register_many) — measured 2.0x the throughput of the vmapped
        single-program path on v5e (2.04 vs 1.00 pairs/s at bench shape,
        tools/batch_bench.py) AND bit-identical to register() per pair,
        because vmap turns the refinement/ICP while_loops into
        run-until-slowest and the safeguard lax.cond into a select (both
        branches execute). The vmapped program earns its keep only when the
        batch axis is sharded over a mesh ('data' axis) for multi-chip
        evaluation fan-out; ``force_vmapped=True`` exercises it on one chip
        (tests, HBM sizing).

        Vmapped path's two-pass safeguard: the batched program computes the
        learned refinement answer only (plus the weighted-sum gate bit);
        pairs whose gate fails — rare by construction, the gate exists to
        catch pathological pairs (deep_global_registration.py:276-315) —
        rerun through the sequential fused path whose lax.cond executes the
        full-budget RANSAC. Pads the batch to the device count when sharded.
        """
        if mesh is None and not force_vmapped:
            return self.register_many(xyz0_list, xyz1_list)
        if mesh is None and len(xyz0_list) > self._MAX_SUB_BATCH:
            outs = []
            for i in range(0, len(xyz0_list), self._MAX_SUB_BATCH):
                outs.append(self.register_batch(
                    xyz0_list[i:i + self._MAX_SUB_BATCH],
                    xyz1_list[i:i + self._MAX_SUB_BATCH],
                    force_vmapped=True))
            return np.concatenate(outs, axis=0)
        clouds0 = [self._as_array(x) for x in xyz0_list]
        clouds1 = [self._as_array(x) for x in xyz1_list]
        b = len(clouds0)
        cap = _bucket_for(max(max(len(c) for c in clouds0),
                              max(len(c) for c in clouds1)), self.buckets)
        pad_b = b
        if mesh is not None:
            nd = mesh.devices.size
            pad_b = -(-b // nd) * nd
        xyz_pair = np.stack([
            np.stack([_pad_cloud(clouds0[i % b], cap),
                      _pad_cloud(clouds1[i % b], cap)]) for i in range(pad_b)])
        nums = np.array([[len(clouds0[i % b]), len(clouds1[i % b])]
                         for i in range(pad_b)], np.int32)

        params = (self.fcgf_params, self.fcgf_state,
                  self.inlier_params, self.inlier_state)
        sharding = repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            params = jax.tree.map(lambda a: jax.device_put(a, repl), params)

        def put(a):
            a = jnp.asarray(a)
            return jax.device_put(a, sharding) if sharding is not None else a

        # Phase 1: voxelize at the raw bucket; re-bucket the whole batch to
        # the voxel-count capacity before the heavy phase (see
        # register_pair_device's docstring).
        xyz_sel, grids = self._quantize_batch(put(xyz_pair), put(nums))
        net_cap = _bucket_for(int(np.asarray(grids.num).max()), self.buckets)
        if net_cap != cap:
            xyz_sel = xyz_sel[:, :, :net_cap]
            grids = Grid(coords=grids.coords[:, :, :net_cap], num=grids.num)

        T, gate_ok = jax.device_get(
            self._register_batch_jit(*params, xyz_sel, grids))
        T = np.array(T[:b])  # writable copy: gate-failing rows are replaced
        for i in np.nonzero(~np.asarray(gate_ok)[:b])[0]:
            log.info("register_batch: pair %d failed the weighted-sum gate or "
                     "its ICP candidate lists went stale — rerunning through "
                     "the sequential fused path", int(i))
            T[i] = self.register(clouds0[i], clouds1[i])
        return T

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def _as_array(self, pcd) -> np.ndarray:
        """Accept numpy arrays (or objects exposing .points) as raw clouds."""
        if hasattr(pcd, "points"):
            return np.asarray(pcd.points, dtype=np.float32)
        return np.asarray(pcd, dtype=np.float32)

    # ------------------------------------------------------------------
    # staged public API (reference deep_global_registration.py:134-236) —
    # numpy in/out convenience wrappers around the jitted stages; register()
    # composes fused versions of the same computations.
    # ------------------------------------------------------------------
    def preprocess(self, pcd):
        """Stage 0 (ref :134-161): voxelize a raw cloud. Returns
        (xyz [M, 3] f32 one point per voxel, coords [M, 3] int32 voxel
        coordinates, feats [M, 1] dummy ones) as numpy arrays."""
        xyz = self._as_array(pcd)
        cap = _bucket_for(len(xyz), self.buckets)
        pair = jnp.asarray(np.stack([_pad_cloud(xyz, cap)] * 2))
        nums = jnp.asarray([len(xyz), len(xyz)], np.int32)
        xyz_sel, grids = self._quantize(pair, nums)
        m = int(grids.num[0])
        return (np.asarray(xyz_sel[0][:m]), np.asarray(grids.coords[0][:m]),
                np.ones((m, 1), np.float32))

    def fcgf_feature_extraction(self, feats, coords) -> np.ndarray:
        """Stage 1 (ref :163-169): FCGF features for voxel coords [M, 3].
        ``feats`` is accepted for signature parity (the net consumes ones)."""
        coords = np.asarray(coords, np.int32)
        cap = _bucket_for(len(coords), self.buckets)
        cpad = np.full((1, cap, 3), 32766, np.int32)
        cpad[0, : len(coords)] = coords
        grids = Grid(coords=jnp.asarray(cpad),
                     num=jnp.asarray([len(coords)], np.int32))
        out, _ = self._features(self.fcgf_params, self.fcgf_state, grids,
                                grids.num)
        return np.asarray(out[0][: len(coords)])

    def fcgf_feature_matching(self, feats0, feats1):
        """Stage 2 (ref :171-183): 1-NN feature correspondences. Returns
        (corres_idx0 arange, corres_idx1 nearest index) as numpy int arrays."""
        f0, f1 = np.asarray(feats0, np.float32), np.asarray(feats1, np.float32)
        cap0 = _bucket_for(len(f0), self.buckets)
        cap1 = _bucket_for(len(f1), self.buckets)
        idx1, _ = knn.find_nn(
            jnp.asarray(np.pad(f0, ((0, cap0 - len(f0)), (0, 0)))),
            jnp.asarray(np.pad(f1, ((0, cap1 - len(f1)), (0, 0)))),
            jnp.int32(len(f0)), jnp.int32(len(f1)))
        return np.arange(len(f0), dtype=np.int64), np.asarray(idx1[: len(f0)])

    def inlier_feature_generation(self, xyz0, xyz1, coords0, coords1,
                                  fcgf_feats0, fcgf_feats1,
                                  corres_idx0, corres_idx1) -> np.ndarray:
        """Stage 3 (ref :185-208): assemble the 6D net's input features."""
        i0 = np.asarray(corres_idx0)
        i1 = np.asarray(corres_idx1)
        if self.inlier_feature_type == "ones":
            return np.ones((len(i0), 1), np.float32)
        if self.inlier_feature_type == "feats":
            return np.concatenate([np.asarray(fcgf_feats0)[i0],
                                   np.asarray(fcgf_feats1)[i1]], axis=1)
        if self.inlier_feature_type == "coords":
            return np.concatenate([np.cos(np.asarray(xyz0)[i0]),
                                   np.cos(np.asarray(xyz1)[i1])],
                                  axis=1).astype(np.float32)
        raise TypeError(f"undefined inlier feature type {self.inlier_feature_type}")

    def inlier_prediction(self, inlier_feats, coords) -> np.ndarray:
        """Stage 4 (ref :210-217): inlier logits for 6D coords [M, 6]."""
        coords = np.asarray(coords, np.int32)
        m = len(coords)
        cap = _bucket_for(m, self.buckets)
        cpad = np.full((cap, 6), 32766, np.int32)
        cpad[:m] = coords
        fpad = np.zeros((cap, inlier_feats.shape[1]), np.float32)
        fpad[:m] = np.asarray(inlier_feats, np.float32)

        if self._staged_inlier_jit is None:
            # Cached once: a fresh jax.jit wrapper per call would retrace
            # (minutes on this platform) on every staged-API invocation.
            @jax.jit
            def run(params, state, c, f, num):
                grid6 = Grid(coords=c, num=num)
                plan = jax.vmap(self.inlier_spec.build_plan,
                                in_axes=(0, None, None))(
                    jax.tree.map(lambda x: x[None], grid6), self.inlier_cfg,
                    self.level_shrink_6d)
                logits, _ = self.inlier_spec.apply(
                    params, state, self.inlier_cfg, plan, f[None], train=False)
                return logits[0]

            self._staged_inlier_jit = run

        out = self._staged_inlier_jit(
            self.inlier_params, self.inlier_state, jnp.asarray(cpad),
            jnp.asarray(fpad), jnp.int32(m))
        return np.asarray(out[:m])

    def safeguard_registration(self, pcd0, pcd1, idx0, idx1, feats0, feats1,
                               distance_threshold, num_iterations) -> np.ndarray:
        """Safeguard RANSAC (ref :219-236). num_iterations plays the role of
        the parallel hypothesis budget. Returns a 4x4 transform."""
        xyz0 = self._as_array(pcd0)
        xyz1 = self._as_array(pcd1)
        cap = _bucket_for(max(len(xyz0), len(xyz1)), self.buckets)
        self._rng, key = jax.random.split(self._rng)
        h = int(min(max(num_iterations, 1024), 65536))
        if self._staged_ransac_jit is None:
            # Cached once (same retrace economics as _staged_inlier_jit).
            self._staged_ransac_jit = (
                jax.jit(ransac.ransac_correspondence, static_argnames=(
                    "distance_threshold", "num_hypotheses")),
                jax.jit(ransac.ransac_feature_matching, static_argnames=(
                    "distance_threshold", "num_hypotheses")))
        if self.safeguard_method == "correspondence":
            x = _pad_cloud(xyz0[np.asarray(idx0)], cap)
            y = _pad_cloud(xyz1[np.asarray(idx1)], cap)
            res = self._staged_ransac_jit[0](
                key, jnp.asarray(x), jnp.asarray(y), jnp.int32(len(idx0)),
                distance_threshold=float(distance_threshold), num_hypotheses=h)
        else:
            f0 = np.zeros((cap, np.asarray(feats0).shape[1]), np.float32)
            f0[: len(feats0)] = feats0
            f1 = np.zeros_like(f0)
            f1[: len(feats1)] = feats1
            res = self._staged_ransac_jit[1](
                key, jnp.asarray(_pad_cloud(xyz0, cap)),
                jnp.asarray(_pad_cloud(xyz1, cap)), jnp.asarray(f0),
                jnp.asarray(f1), jnp.int32(len(xyz0)), jnp.int32(len(xyz1)),
                distance_threshold=float(distance_threshold), num_hypotheses=h)
        T = np.eye(4)
        T[:3, :3] = np.asarray(res.R)
        T[:3, 3] = np.asarray(res.t)
        return T

    # In-flight window for register_many: how many pairs may have dispatched-
    # but-uncollected device programs at once. Two pairs of overlap already
    # hide the per-pair host time (~7 ms vs ~550 ms device time at bench
    # shape, tools/stream_probe.py); a BOUNDED window also (a) caps host
    # memory held by in-flight buffers and (b) protects against degraded-
    # dispatch sessions — round 3's driver bench measured ~1.25 s/pair of
    # host dispatch time right after a 414 s cold compile, turning the
    # unbounded stream 3x SLOWER than sequential (VERDICT.md r3 #1). With a
    # window, collection syncs self-throttle the loop, so the stream can
    # never fall meaningfully below sequential throughput.
    _STREAM_WINDOW = 3

    def register_many(self, xyz0_list, xyz1_list) -> np.ndarray:
        """Register a stream of pairs with cross-pair pipelining.

        Semantically identical to calling register() per pair (same fused
        program, same speculative bucket), but each pair's device programs
        are dispatched asynchronously and results sync a bounded window
        behind the dispatches — the per-pair host round trips that serialize
        the sequential loop overlap with device execution. Returns [B, 4, 4].
        Falls back to sequential register() for the host-KNN /
        feature-matching-safeguard / --split_register modes."""
        if self.knn_search_method == "cpu" or self.split_register or \
                self.safeguard_method != "correspondence":
            return np.stack([self.register(a, b)
                             for a, b in zip(xyz0_list, xyz1_list)])

        out = []

        def collect(entry):
            spec, xyz_sel, grids, raw_cap, guess = entry
            net_cap = _bucket_for(int(np.asarray(grids.num).max()),
                                  self.buckets)
            self._net_cap_guess = net_cap
            if net_cap > guess:  # speculation truncated real voxels: redo
                xs = xyz_sel[:, :net_cap] if net_cap != raw_cap else xyz_sel
                gr = Grid(coords=grids.coords[:, :net_cap], num=grids.num) \
                    if net_cap != raw_cap else grids
                # Fresh key for the redo: the dispatch loop already advanced
                # self._rng past this pair (and later in-flight pairs consumed
                # those keys), so rewinding to spec[4] would correlate RANSAC
                # hypotheses across pairs and replay used keys.
                self._rng, redo_key = jax.random.split(self._rng)
                spec = self._register_fused(
                    self.fcgf_params, self.fcgf_state, self.inlier_params,
                    self.inlier_state, redo_key, xs, gr)
            T, wsum, ov3, ov6, cand_ok = jax.device_get(spec[:5])
            if bool(ov3) or bool(ov6):
                self.overflow_count += 1
            if bool(ov3):
                log.warning("kernel-map table overflow: entries dropped")
            if bool(ov6):
                log.warning("6D inlier kernel-map table overflow: "
                            "entries dropped")
            if not bool(cand_ok):
                log.warning("ICP candidate lists went stale (pose drift > "
                            "quarter cell); the full-scan ICP fallback ran")
            log.info("Weighted sum %.2f", float(wsum))
            out.append(np.asarray(T, np.float64))

        inflight = []
        for xyz0, xyz1 in zip(xyz0_list, xyz1_list):
            xyz0 = self._as_array(xyz0)
            xyz1 = self._as_array(xyz1)
            raw_cap = _bucket_for(max(len(xyz0), len(xyz1)), self.buckets)
            xyz_pair = jnp.asarray(np.stack([_pad_cloud(xyz0, raw_cap),
                                             _pad_cloud(xyz1, raw_cap)]))
            nums = jnp.asarray([len(xyz0), len(xyz1)], np.int32)
            xyz_sel, grids = self._quantize(xyz_pair, nums)

            if self._net_cap_guess is None:  # first pair: sync for the bucket
                guess = _bucket_for(int(np.asarray(grids.num).max()),
                                    self.buckets)
                self._net_cap_guess = guess
            guess = min(self._net_cap_guess, raw_cap)
            xs, gr = xyz_sel, grids
            if guess != raw_cap:
                xs = xyz_sel[:, :guess]
                gr = Grid(coords=grids.coords[:, :guess], num=grids.num)
            spec = self._register_fused(
                self.fcgf_params, self.fcgf_state, self.inlier_params,
                self.inlier_state, self._rng, xs, gr)
            self._rng = spec[5]
            inflight.append((spec, xyz_sel, grids, raw_cap, guess))
            if len(inflight) > self._STREAM_WINDOW:
                collect(inflight.pop(0))

        for entry in inflight:
            collect(entry)
        return np.stack(out)

    def register(self, xyz0, xyz1, inlier_thr: float = 0.00) -> np.ndarray:
        """Register xyz0 onto xyz1; returns the 4x4 transform as numpy.

        Mirrors deep_global_registration.py:238-324 including the weighted-sum
        safeguard gate (wsum >= max(200, 0.05 * N)) and the final ICP polish.
        """
        self.reg_timer.tic()
        xyz0 = self._as_array(xyz0)
        xyz1 = self._as_array(xyz1)

        raw_cap = _bucket_for(max(len(xyz0), len(xyz1)), self.buckets)
        xyz_pair = jnp.asarray(np.stack([_pad_cloud(xyz0, raw_cap),
                                         _pad_cloud(xyz1, raw_cap)]))
        nums = jnp.asarray([len(xyz0), len(xyz1)], np.int32)
        xyz_sel, grids = self._quantize(xyz_pair, nums)

        def rebucket(cap):
            if cap == raw_cap:
                return xyz_sel, grids
            return xyz_sel[:, :cap], Grid(coords=grids.coords[:, :cap],
                                          num=grids.num)

        # Fused fast path: one device program from features to the polished T
        # (the staged path below remains for the host-KNN dispatch, the
        # feature-matching safeguard, per-stage timing, and the
        # --split_register cold-start mode).
        if not self.split_register and self.knn_search_method != "cpu" and \
                self.safeguard_method == "correspondence":
            # Speculative bucket choice: dispatch the fused program at the
            # last pair's bucket WITHOUT waiting for this pair's voxel counts
            # — the nvox readback then overlaps the device execution instead
            # of serializing a full tunnel round trip before it. A too-small
            # guess would truncate real voxels, so the speculative result is
            # discarded and recomputed at the correct bucket (one extra
            # dispatch on bucket growth only; workloads keep a stable bucket).
            if self._net_cap_guess is None:
                # First pair: pick the bucket from real voxel counts (avoids
                # compiling the fused program at a bucket no pair ever uses).
                nvox = np.asarray(grids.num)
                guess = _bucket_for(int(nvox.max()), self.buckets)
                spec = self._register_fused(
                    self.fcgf_params, self.fcgf_state, self.inlier_params,
                    self.inlier_state, self._rng, *rebucket(guess))
            else:
                guess = min(self._net_cap_guess, raw_cap)
                spec = self._register_fused(
                    self.fcgf_params, self.fcgf_state, self.inlier_params,
                    self.inlier_state, self._rng, *rebucket(guess))
                nvox = np.asarray(grids.num)  # overlaps the running program
            net_cap = _bucket_for(int(nvox.max()), self.buckets)
            self._net_cap_guess = net_cap
            if net_cap <= guess:
                T_dev, wsum_dev, ov3, ov6, cand_ok, self._rng = spec
            else:  # speculation truncated real voxels: redo at the right cap
                (T_dev, wsum_dev, ov3, ov6, cand_ok,
                 self._rng) = self._register_fused(
                    self.fcgf_params, self.fcgf_state, self.inlier_params,
                    self.inlier_state, spec[5], *rebucket(net_cap))
            # One bundled device->host fetch: separate np.asarray/float/bool
            # reads each cost a tunnel round trip.
            T, wsum, ov3, ov6, cand_ok = jax.device_get(
                (T_dev, wsum_dev, ov3, ov6, cand_ok))
            T = np.asarray(T, np.float64)
            wsum = float(wsum)
            if bool(ov3) or bool(ov6):
                self.overflow_count += 1
            if bool(ov3):
                log.warning(
                    "kernel-map table overflow: entries dropped (cloud exceeds "
                    "the --dense_extent box or a hash bucket overflowed its "
                    "probe window) — features are degraded for this pair")
            if bool(ov6):
                log.warning("6D inlier kernel-map table overflow: entries dropped")
            if not bool(cand_ok):
                log.warning("ICP candidate lists went stale (pose drift > "
                            "quarter cell); the full-scan ICP fallback ran")
            wsum_threshold = max(200, int(nvox[0]) * 0.05)
            sign = ">=" if wsum >= wsum_threshold else "<"
            log.info("Weighted sum %.2f %s threshold %.1f", wsum, sign,
                     wsum_threshold)
            log.info("=> DGR takes %.2f s", self.reg_timer.toc(False))
            return T

        nvox = np.asarray(grids.num)  # host sync: choose the network bucket
        net_cap = _bucket_for(int(nvox.max()), self.buckets)
        xyz_sel, grids = rebucket(net_cap)

        self.feat_timer.tic()
        feats, overflow = self._features(self.fcgf_params, self.fcgf_state,
                                         grids, grids.num)
        feats.block_until_ready()
        self.feat_timer.toc()
        if bool(overflow):  # piggybacks on the block_until_ready sync above
            log.warning(
                "kernel-map table overflow: entries dropped (cloud exceeds the "
                "--dense_extent box or a hash bucket overflowed its probe "
                "window) — features are degraded for this pair")

        if self.knn_search_method == "cpu":
            # Host KD-tree matching (core/knn.py:77-103 'cpu' dispatch): pull
            # the valid feature rows once, query on host, pad back.
            n0, n1 = int(nvox[0]), int(nvox[1])
            f_host = np.asarray(feats)
            idx_host = knn.find_knn_cpu(f_host[0, :n0], f_host[1, :n1], knn=1)
            idx1_in = np.zeros(feats.shape[1], np.int32)
            idx1_in[:n0] = np.asarray(idx_host, np.int32).reshape(-1)
            idx1, weights, wsum_dev, overflow6 = self._inlier_from_idx(
                self.inlier_params, self.inlier_state, jnp.asarray(idx1_in),
                feats[0], feats[1], xyz_sel[0], xyz_sel[1],
                grids.coords[0], grids.coords[1], grids.num[0], grids.num[1])
        else:
            idx1, weights, wsum_dev, overflow6 = self._match_and_inlier(
                self.inlier_params, self.inlier_state, feats[0], feats[1],
                xyz_sel[0], xyz_sel[1], grids.coords[0], grids.coords[1],
                grids.num[0], grids.num[1])
        wsum = float(wsum_dev)  # host sync: the safeguard gate scalar
        if bool(overflow6):
            log.warning("6D inlier kernel-map table overflow: entries dropped")
        if bool(overflow) or bool(overflow6):
            self.overflow_count += 1

        num0 = int(nvox[0])
        wsum_threshold = max(200, num0 * 0.05)
        sign = ">=" if wsum >= wsum_threshold else "<"
        log.info("Weighted sum %.2f %s threshold %.1f", wsum, sign, wsum_threshold)

        xyz0_corr = xyz_sel[0]
        xyz1_corr = xyz_sel[1][idx1]
        T = np.identity(4)
        if wsum >= wsum_threshold:
            R, t = self._refine(xyz0_corr, xyz1_corr, weights)
            T[:3, :3] = np.asarray(R)
            T[:3, 3] = np.asarray(t)
            log.info("=> DGR takes %.2f s", self.reg_timer.toc(False))
        else:
            # Safeguard RANSAC (deep_global_registration.py:302-315); the
            # 'feature_matching' mode re-derives correspondences from features
            # (repairing the reference's broken branch at :228-233).
            self._rng, key = jax.random.split(self._rng)
            if self.safeguard_method == "correspondence":
                R, t = self._safeguard(key, xyz0_corr, xyz1_corr, grids.num[0])
            else:
                R, t = self._safeguard_feat(key, xyz_sel[0], xyz_sel[1],
                                            feats[0], feats[1],
                                            grids.num[0], grids.num[1])
            T[:3, :3] = np.asarray(R)
            T[:3, 3] = np.asarray(t)
            log.info("=> Safeguard takes %.2f s", self.reg_timer.toc(False))

        if self.use_icp:
            T_dev, cand_ok = self._icp_polish(
                xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1],
                jnp.asarray(T, jnp.float32))
            T, cand_ok = jax.device_get((T_dev, cand_ok))
            T = np.asarray(T)
            if not bool(cand_ok):
                log.warning("ICP candidate lists went stale (pose drift > "
                            "quarter cell); the full-scan ICP fallback ran")
        return T


def _has(cfg, key) -> bool:
    return key in cfg if isinstance(cfg, dict) else hasattr(cfg, key)
