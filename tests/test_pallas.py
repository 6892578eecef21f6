"""Pallas fused SSIM+L1 kernel vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.ops.pallas import fused_reprojection_error, pallas_supported
from monodepth_tpu.ops.ssim import reprojection_error


@pytest.fixture
def images(rng):
    pred = jnp.asarray(rng.uniform(size=(2, 32, 48, 3)).astype(np.float32))
    targ = jnp.asarray(rng.uniform(size=(2, 32, 48, 3)).astype(np.float32))
    return pred, targ


def test_forward_matches_reference(images):
    pred, targ = images
    ref = reprojection_error(pred, targ)
    pal = fused_reprojection_error(pred, targ, True)
    assert pal.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-6)


def test_backward_matches_reference(images):
    pred, targ = images
    g = jnp.ones_like(reprojection_error(pred, targ))
    ref_grads = jax.vjp(reprojection_error, pred, targ)[1](g)
    pal_grads = jax.vjp(
        lambda p, t: fused_reprojection_error(p, t, True), pred, targ)[1](g)
    for a, b in zip(ref_grads, pal_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_identical_images_zero_ssim(images):
    pred, _ = images
    out = fused_reprojection_error(pred, pred, True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_supported_shapes():
    assert pallas_supported(192, 640)
    assert not pallas_supported(320, 1024)
