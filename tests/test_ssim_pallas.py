"""Fused Pallas SSIM vs the XLA-conv reference implementation.

Both use the 11x11 sigma-1.5 separable gaussian window; forward values and
both input gradients must agree. (Interpret mode here; tests/test_tpu.py
gates the compiled kernel on hardware.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import (
    fused_ssim,
    fused_ssim_sum,
)
from intro_to_gaussian_splatting_tpu.train.loss import ssim_chw


def _imgs(h, w, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    a = jax.random.uniform(k1, (3, h, w))
    b = jnp.clip(a + 0.2 * jax.random.normal(k2, (3, h, w)), 0.0, 1.0)
    return a, b


@pytest.mark.parametrize("h,w", [(32, 48), (40, 140), (77, 131)])
def test_forward_matches_reference(h, w):
    a, b = _imgs(h, w)
    got = float(fused_ssim(a, b, interpret=True))
    want = float(ssim_chw(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_forward_identical_images():
    a, _ = _imgs(40, 40, seed=3)
    got = float(fused_ssim(a, a, interpret=True))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


@pytest.mark.parametrize("h,w", [(32, 48), (45, 70)])
def test_gradients_match_reference(h, w):
    a, b = _imgs(h, w, seed=1)

    def loss_fused(a, b):
        return 1.0 - fused_ssim(a, b, interpret=True)

    def loss_ref(a, b):
        return 1.0 - ssim_chw(a, b)

    ga_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(a, b)
    ga_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    scale = float(jnp.max(jnp.abs(ga_r)))
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r),
                               rtol=1e-4, atol=1e-6 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               rtol=1e-4, atol=1e-6 * max(scale, 1.0))


def test_grad_target_false_matches_pred_grad():
    a, b = _imgs(30, 50, seed=4)
    g_full = jax.grad(
        lambda x: fused_ssim(x, b, interpret=True))(a)
    g_fast = jax.grad(
        lambda x: fused_ssim(x, b, interpret=True, grad_target=False))(a)
    # same math, different instruction order -> tiny reassociation noise
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_full),
                               rtol=1e-3, atol=1e-9)


def test_gradient_against_finite_differences():
    a, b = _imgs(24, 36, seed=2)

    def f(a):
        # float64 off: evaluate the MEAN (O(1) magnitude) so fp32 rounding
        # does not drown the central difference
        return float(fused_ssim(a, b, interpret=True))

    g = np.asarray(jax.grad(
        lambda x: fused_ssim(x, b, interpret=True))(a))
    # probe the 4 largest-|gradient| pixels: best signal-to-noise
    flat = np.argsort(-np.abs(g).ravel())[:4]
    eps = 2e-3
    for idx in flat:
        c, i, j = np.unravel_index(idx, g.shape)
        e = jnp.zeros_like(a).at[c, i, j].set(eps)
        fd = (f(a + e) - f(a - e)) / (2 * eps)
        np.testing.assert_allclose(g[c, i, j], fd, rtol=5e-2, atol=3e-5)


@pytest.mark.parametrize("h,w", [(32, 48), (77, 131), (150, 140)])
@pytest.mark.parametrize("grad_target", [False, True])
def test_precompute_grad_matches_split_path(h, w, grad_target):
    """The fused value+gradient band pass (precompute_grad=True, what
    training uses) must agree with the split fwd/bwd path in value AND
    gradients for both inputs."""
    a, b = _imgs(h, w, seed=9)

    def f_split(a, b):
        return fused_ssim(a, b, interpret=True, grad_target=grad_target)

    def f_fused(a, b):
        return fused_ssim(a, b, interpret=True, grad_target=grad_target,
                          precompute_grad=True)

    v1, (ga1, gb1) = jax.value_and_grad(f_split, argnums=(0, 1))(a, b)
    v2, (ga2, gb2) = jax.value_and_grad(f_fused, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ga2), np.asarray(ga1),
                               rtol=1e-5, atol=1e-7)
    if grad_target:
        np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1),
                                   rtol=1e-5, atol=1e-7)
    else:
        assert np.all(np.asarray(gb2) == 0.0)
