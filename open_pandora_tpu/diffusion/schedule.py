"""Diffusion schedules — pure NumPy/JAX functions, always fp32+.

Behavioral spec from the reference (values must match exactly):
  - linear betas: linspace(sqrt(start), sqrt(end), N)**2 in float64
    (lvdm/models/utils_diffusion.py:31-36)
  - zero-terminal-SNR rescale per arXiv:2305.08891 Alg. 1
    (utils_diffusion.py:112-143)
  - DDIM timestep spacing 'uniform' | 'uniform_trailing' | 'quad'
    (utils_diffusion.py:56-76)
  - DDIM sigmas: eta*sqrt((1-a_prev)/(1-a) * (1-a/a_prev))
    (utils_diffusion.py:80-94)
  - dynamic rescale array: concat(linspace(1, base_scale, turning_step),
    full(N, base_scale)) (ddpm3d.py:505-510, turning_step=400)

The reference stores these as bfloat16 torch buffers (ddpm3d.py:139) and then
re-casts fp32 in the DDIM sampler (ddim.py:27-29); we keep fp32 end-to-end,
which matches the precision actually used on the sampling path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from open_pandora_tpu.core.config import DiffusionConfig


def make_beta_schedule(
    n_timesteps: int, linear_start: float, linear_end: float
) -> np.ndarray:
    return (
        np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timesteps, dtype=np.float64)
        ** 2
    )


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """arXiv:2305.08891 Algorithm 1 (utils_diffusion.py:112-143)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    abar_sqrt = np.sqrt(alphas_cumprod)
    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()
    abar_sqrt -= abar_sqrt_T
    abar_sqrt *= abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)
    abar = abar_sqrt ** 2
    alphas = abar[1:] / abar[:-1]
    alphas = np.concatenate([abar[0:1], alphas])
    return 1.0 - alphas


@dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep arrays, fp32, shape (N,). A pure pytree of constants."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    scale_arr: jnp.ndarray  # dynamic rescale (len N + turning pad, indexed by t)
    num_timesteps: int

    def extract(self, arr: jnp.ndarray, t: jnp.ndarray, broadcast_ndim: int):
        """Gather arr[t] and reshape to (b, 1, 1, ...) for broadcasting
        (reference: lvdm/common.py extract_into_tensor)."""
        out = jnp.take(arr, t, axis=0)
        return out.reshape(out.shape[0], *([1] * (broadcast_ndim - 1)))


def make_schedule(cfg: DiffusionConfig) -> DiffusionSchedule:
    betas = make_beta_schedule(cfg.timesteps, cfg.linear_start, cfg.linear_end)
    if cfg.rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    if cfg.use_dynamic_rescale:
        turning_step = 400  # ddpm3d.py:475
        scale_arr = np.concatenate(
            [
                np.linspace(1.0, cfg.base_scale, turning_step),
                np.full(cfg.timesteps, cfg.base_scale),
            ]
        )
    else:
        scale_arr = np.ones(cfg.timesteps)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        scale_arr=f32(scale_arr),
        num_timesteps=cfg.timesteps,
    )


# ---------------------------------------------------------------------------
# DDIM discretization
# ---------------------------------------------------------------------------


def make_ddim_timesteps(
    method: str, num_ddim_steps: int, num_ddpm_steps: int
) -> np.ndarray:
    """(utils_diffusion.py:56-76). Returns ascending int64 timesteps."""
    if method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        steps = np.asarray(list(range(0, num_ddpm_steps, c))) + 1
    elif method == "uniform_trailing":
        c = num_ddpm_steps / num_ddim_steps
        steps = np.flip(np.round(np.arange(num_ddpm_steps, 0, -c))).astype(np.int64) - 1
    elif method == "quad":
        steps = (
            np.linspace(0, np.sqrt(num_ddpm_steps * 0.8), num_ddim_steps) ** 2
        ).astype(int) + 1
    else:
        raise NotImplementedError(f"unknown ddim discretization {method!r}")
    return steps.astype(np.int64)


def make_ddim_params(alphas_cumprod: np.ndarray, ddim_timesteps: np.ndarray, eta: float):
    """alphas / alphas_prev / sigmas per DDIM step (utils_diffusion.py:80-94)."""
    alphas_cumprod = np.asarray(alphas_cumprod, dtype=np.float64)
    a = alphas_cumprod[ddim_timesteps]
    a_prev = np.asarray(
        [alphas_cumprod[0]] + alphas_cumprod[ddim_timesteps[:-1]].tolist()
    )
    sigmas = eta * np.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
    return a, a_prev, sigmas


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------


def _bf16_freq_table(half: int, max_period: int) -> np.ndarray:
    """The reference's bf16 frequency table (utils_diffusion.py:19-21),
    bit-exact. torch evaluates `scalar * bf16_tensor` by rounding the
    full-precision per-element product to bf16 (the scalar is NOT pre-cast),
    so each step of the chain is: compute wide, round to bf16. Verified
    identical to the torch expression for half=16 and half=160."""
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    i = np.arange(half, dtype=np.float64)
    a = (-math.log(max_period) * i).astype(bf16)
    a = (a.astype(np.float64) / half).astype(bf16)
    return np.exp(a.astype(np.float32)).astype(bf16).astype(np.float32)


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal embedding (utils_diffusion.py:8-28). The reference computes
    the frequency table in bfloat16 (:20) — reproduced bit-exactly so
    converted weights see identical inputs; args product is fp32 like the
    reference."""
    half = dim // 2
    freqs = jnp.asarray(_bf16_freq_table(half, max_period))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
