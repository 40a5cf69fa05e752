import numpy as np
import pytest

from open_pandora_tpu.core.config import DiffusionConfig
from open_pandora_tpu.diffusion.schedule import (
    make_beta_schedule,
    make_ddim_params,
    make_ddim_timesteps,
    make_schedule,
    rescale_zero_terminal_snr,
    timestep_embedding,
)


def test_linear_betas_endpoints():
    betas = make_beta_schedule(1000, 0.00085, 0.012)
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # strictly increasing
    assert np.all(np.diff(betas) > 0)


def test_zero_terminal_snr_property():
    betas = make_beta_schedule(1000, 0.00085, 0.012)
    rb = rescale_zero_terminal_snr(betas)
    ac = np.cumprod(1.0 - rb)
    # terminal SNR is exactly zero, first alpha_bar preserved
    assert abs(ac[-1]) < 1e-12
    np.testing.assert_allclose(ac[0], (1.0 - betas[0]), rtol=1e-10)


def test_schedule_is_fp32():
    sched = make_schedule(DiffusionConfig())
    assert sched.betas.dtype == np.float32
    assert sched.alphas_cumprod.dtype == np.float32
    assert sched.scale_arr.dtype == np.float32
    assert sched.scale_arr.shape[0] == 400 + 1000  # turning_step + N
    np.testing.assert_allclose(np.asarray(sched.scale_arr)[0], 1.0)
    np.testing.assert_allclose(np.asarray(sched.scale_arr)[-1], 0.7, rtol=1e-6)


def test_ddim_timesteps_uniform_trailing_exact():
    # reference formula (utils_diffusion.py:62-65):
    # flip(round(arange(1000, 0, -1000/S))) - 1
    steps = make_ddim_timesteps("uniform_trailing", 10, 1000)
    np.testing.assert_array_equal(
        steps, [99, 199, 299, 399, 499, 599, 699, 799, 899, 999]
    )
    steps50 = make_ddim_timesteps("uniform_trailing", 50, 1000)
    assert steps50[0] == 19 and steps50[-1] == 999 and len(steps50) == 50


def test_ddim_timesteps_uniform_exact():
    steps = make_ddim_timesteps("uniform", 10, 1000)
    np.testing.assert_array_equal(steps, np.arange(0, 1000, 100) + 1)


def test_ddim_sigmas_eta_zero():
    sched = make_schedule(DiffusionConfig())
    ts = make_ddim_timesteps("uniform_trailing", 50, 1000)
    a, a_prev, sigmas = make_ddim_params(np.asarray(sched.alphas_cumprod), ts, 0.0)
    np.testing.assert_allclose(sigmas, 0.0)
    # a_prev[i] == a[i-1]; a_prev[0] == alphas_cumprod[0]
    np.testing.assert_allclose(a_prev[1:], a[:-1])
    np.testing.assert_allclose(
        a_prev[0], np.asarray(sched.alphas_cumprod, dtype=np.float64)[0], rtol=1e-6
    )


def test_ddim_sigma_formula():
    sched = make_schedule(DiffusionConfig(rescale_betas_zero_snr=False))
    ts = make_ddim_timesteps("uniform", 10, 1000)
    a, a_prev, sigmas = make_ddim_params(np.asarray(sched.alphas_cumprod), ts, 1.0)
    expect = np.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
    np.testing.assert_allclose(sigmas, expect, rtol=1e-12)


def test_timestep_embedding_shape_and_values():
    import jax.numpy as jnp

    t = jnp.array([0.0, 500.0])
    emb = timestep_embedding(t, 320)
    assert emb.shape == (2, 320)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


def test_timestep_embedding_odd_dim():
    import jax.numpy as jnp

    emb = timestep_embedding(jnp.array([3.0]), 7)
    assert emb.shape == (1, 7)
    assert emb[0, -1] == 0.0
