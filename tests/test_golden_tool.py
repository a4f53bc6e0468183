"""tools/golden_fcgf.py — K-order candidate machinery smoke tests."""

import numpy as np
import pytest
import jax

from deepglobalregistration_tpu.models import load_model
from tools.golden_fcgf import k_order_candidates, permute_kernels, run_fcgf


@pytest.mark.slow
def test_permute_roundtrip_and_discrimination(rng):
    spec = load_model("ResUNetBN2F")
    cfg = spec.make_config(1, 8, conv1_kernel_size=3, normalize_feature=True, D=3)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    xyz = (rng.rand(400, 3) * 1.5).astype(np.float32)

    cands = k_order_candidates(3, 3)
    f_id, c_id = run_fcgf(spec, cfg, params, state, xyz, 0.05)

    # identity permutation is a no-op
    p_same = permute_kernels(params, lambda K: cands["identity"] if K == 27 else None)
    f2, _ = run_fcgf(spec, cfg, p_same, state, xyz, 0.05)
    np.testing.assert_array_equal(f_id, f2)

    # a wrong K-order must measurably change features (the golden test can
    # discriminate), and permuting back must restore them exactly
    p_rev = permute_kernels(params, lambda K: cands["reversed"] if K == 27 else None)
    f_rev, _ = run_fcgf(spec, cfg, p_rev, state, xyz, 0.05)
    assert np.abs(f_rev - f_id).max() > 1e-3
    inv = np.argsort(cands["reversed"])
    p_back = permute_kernels(p_rev, lambda K: inv if K == 27 else None)
    f_back, _ = run_fcgf(spec, cfg, p_back, state, xyz, 0.05)
    np.testing.assert_array_equal(f_id, f_back)
