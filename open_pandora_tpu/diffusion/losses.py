"""Training-side diffusion math: q_sample, v-target, p_losses.

Behavioral spec: /root/reference/DynamiCrafter/lvdm/models/ddpm3d.py
q_sample :301-304, get_v :306-310, p_losses :741-797 (v-target MSE with
per-sample NaN zeroing and logvar weighting; shipped config uses
logvar_init=0 / learn_logvar False so the weighting is identity).
Dynamic rescale of x0 before p_losses: ddpm3d.py:701-706.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_pandora_tpu.diffusion.schedule import DiffusionSchedule


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    sa = sched.extract(sched.sqrt_alphas_cumprod, t, x_start.ndim)
    s1ma = sched.extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return sa * x_start + s1ma * noise


def get_v(sched: DiffusionSchedule, x, noise, t):
    sa = sched.extract(sched.sqrt_alphas_cumprod, t, x.ndim)
    s1ma = sched.extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    return sa * noise - s1ma * x


def diffusion_loss(
    apply_model,
    sched: DiffusionSchedule,
    x_start: jnp.ndarray,
    cond,
    key: jax.Array,
    parameterization: str = "v",
    use_dynamic_rescale: bool = True,
    l_simple_weight: float = 1.0,
):
    """One training-loss evaluation. Returns (loss, metrics).

    x_start: clean latents [b, t, h, w, c] (any layout; reductions are over
    all non-batch axes, matching .mean([1,2,3,4]) at ddpm3d.py:764).
    """
    b = x_start.shape[0]
    t_key, n_key = jax.random.split(key)
    t = jax.random.randint(t_key, (b,), 0, sched.num_timesteps)

    if use_dynamic_rescale:
        x_start = x_start * sched.extract(sched.scale_arr, t, x_start.ndim)

    noise = jax.random.normal(n_key, x_start.shape, dtype=x_start.dtype)
    x_noisy = q_sample(sched, x_start, t, noise)
    model_output = apply_model(x_noisy, t, cond)

    if parameterization == "v":
        target = get_v(sched, x_start, noise, t)
    elif parameterization == "eps":
        target = noise
    else:
        target = x_start

    axes = tuple(range(1, x_start.ndim))
    loss_simple = jnp.mean(
        (model_output.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
        axis=axes,
    )
    # NaN-zeroing per sample (ddpm3d.py:770-774)
    loss_simple = jnp.where(jnp.isnan(loss_simple), 0.0, loss_simple)
    loss = l_simple_weight * jnp.mean(loss_simple)
    return loss, {"loss_simple": jnp.mean(loss_simple), "loss": loss}
