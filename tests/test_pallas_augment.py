"""Pallas fused photometric kernel — interpret-mode semantic checks (the
compiled PRNG path is exercised on real TPU hardware by bench/_pallas_tpu_check)."""
import numpy as np
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.ops.pallas_augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    fused_photometric_pallas,
)


@pytest.fixture
def setup(rng):
    B, S = 2, 64
    imgs = jnp.asarray(rng.rand(B, S, S, 3) * 255, jnp.float32)
    scalars = np.zeros((B, 8), np.float32)
    holes = np.zeros((B, 10, 4), np.int32)
    noise = jnp.asarray(rng.randn(B, S, S), jnp.float32)
    ref = (np.asarray(imgs) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return imgs, scalars, holes, noise, ref


def run(imgs, scalars, holes, noise):
    return np.asarray(
        fused_photometric_pallas(
            imgs, jnp.asarray(scalars), jnp.asarray(holes), 0,
            interpret=True, noise=noise,
        )
    )


def test_normalize_only(setup):
    imgs, scalars, holes, noise, ref = setup
    out = run(imgs, scalars, holes, noise)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_cutout(setup):
    imgs, scalars, holes, noise, ref = setup
    scalars[:, 3] = 1.0
    holes[0, 0] = [10, 10, 20, 20]
    out = run(imgs, scalars, holes, noise)
    zero_norm = (0.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[0, 15, 15], zero_norm, atol=1e-5)
    np.testing.assert_allclose(out[0, 50, 50], ref[0, 50, 50], atol=1e-5)
    # image 1 has no holes set
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)


def test_noise_scaling(setup):
    imgs, scalars, holes, noise, ref = setup
    scalars[:, 2] = 1.0
    scalars[:, 1] = 10.0
    out = run(imgs, scalars, holes, noise)
    resid = (out - ref) * IMAGENET_STD * 255.0
    assert abs(resid.std() - 10.0) < 2.0


def test_trunc_top_band(setup):
    imgs, scalars, holes, noise, ref = setup
    scalars[0, 4] = 1.0  # do_trunc
    scalars[0, 5] = 0.1  # sel < 0.25 -> top/left bands
    scalars[0, 6] = 5.0  # th
    scalars[0, 7] = 3.0  # tw
    out = run(imgs, scalars, holes, noise)
    zero_norm = (0.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[0, 2, 30], zero_norm, atol=1e-5)  # top band
    np.testing.assert_allclose(out[0, 30, 1], zero_norm, atol=1e-5)  # left band
    np.testing.assert_allclose(out[0, 30, 30], ref[0, 30, 30], atol=1e-5)


def test_blur_smooths(setup):
    imgs, scalars, holes, noise, ref = setup
    scalars[:, 0] = 1.0
    out = run(imgs, scalars, holes, noise)
    # interior variance must drop under a box blur of white noise
    assert out[:, 2:-2, 2:-2].std() < ref[:, 2:-2, 2:-2].std() * 0.8
