"""Fused Pallas 1-NN kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.ops import knn
from deepglobalregistration_tpu.ops.pallas_knn import find_nn_pallas


def _compare(rng, n0, n1, num0, num1, c):
    f0 = np.zeros((n0, c), np.float32)
    f0[:num0] = rng.randn(num0, c)
    f1 = np.zeros((n1, c), np.float32)
    f1[:num1] = rng.randn(num1, c)
    i_ref, d_ref = knn.find_nn(jnp.asarray(f0), jnp.asarray(f1),
                               jnp.int32(num0), jnp.int32(num1))
    i_p, d_p = find_nn_pallas(jnp.asarray(f0), jnp.asarray(f1),
                              jnp.int32(num0), jnp.int32(num1), interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n0,n1,num0,num1,c", [
    (1024, 2048, 700, 1100, 32),   # feature matching shape
    (512, 1024, 512, 1024, 3),     # xyz / ICP shape, no padding
    (1536, 1024, 33, 1, 8),        # single candidate
])
def test_pallas_nn_matches_scan(rng, n0, n1, num0, num1, c):
    _compare(rng, n0, n1, num0, num1, c)


def test_pallas_nn_exact_self_match(rng):
    # identical rows must match themselves with d == 0 (f32 HIGHEST precision;
    # the bf16-MXU cancellation failure mode this kernel must not reintroduce)
    f = rng.randn(600, 32).astype(np.float32)
    f0 = np.zeros((1024, 32), np.float32)
    f0[:600] = f
    i_p, d_p = find_nn_pallas(jnp.asarray(f0), jnp.asarray(f0),
                              jnp.int32(600), jnp.int32(600), interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p)[:600], np.arange(600))
    np.testing.assert_array_equal(np.asarray(d_p)[:600], np.zeros(600))


def test_pallas_nn_empty_target(rng):
    f0 = rng.randn(512, 8).astype(np.float32)
    i_p, d_p = find_nn_pallas(jnp.asarray(f0), jnp.asarray(f0),
                              jnp.int32(512), jnp.int32(0), interpret=True)
    assert not np.asarray(i_p).any()
    assert np.isinf(np.asarray(d_p)).all()
