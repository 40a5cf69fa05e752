import jax
import jax.numpy as jnp
import numpy as np

from open_pandora_tpu.core.config import DiffusionConfig
from open_pandora_tpu.diffusion.ddim import (
    ddim_sample,
    make_cfg_model_fn,
    make_ddim_schedule,
    rescale_noise_cfg,
)
from open_pandora_tpu.diffusion.schedule import make_schedule


def _params(steps=10, eta=0.0, rescale=False):
    sched = make_schedule(DiffusionConfig(use_dynamic_rescale=rescale))
    return sched, make_ddim_schedule(
        sched, steps, eta, "uniform_trailing", use_dynamic_rescale=rescale
    )


def test_single_step_matches_numpy_reference():
    """One scan step vs a hand-computed p_sample_ddim (ddim.py:217-290)."""
    sched, p = _params(steps=10, eta=0.0)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 4, 4, 4).astype(np.float32)
    v = rng.randn(*x.shape).astype(np.float32)

    def model_fn(xx, tt):
        return {"cond": jnp.asarray(v)}

    out = ddim_sample(
        model_fn,
        # single-step params: slice index 0
        type(p)(**{k: getattr(p, k)[:1] for k in p.__dataclass_fields__}),
        jnp.asarray(x),
        jax.random.PRNGKey(0),
        guidance_scale=1.0,
    )

    # numpy replica of the same step
    a_t = float(p.a_t[0])
    a_prev = float(p.a_prev[0])
    sac, s1m = np.sqrt(a_t), np.sqrt(1.0 - a_t)
    e_t = sac * v + s1m * x
    pred_x0 = sac * x - s1m * v
    dir_xt = np.sqrt(1.0 - a_prev) * e_t
    expect = np.sqrt(a_prev) * pred_x0 + dir_xt
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_perfect_model_recovers_x0():
    """A model that always predicts the exact v for a fixed x0 drives the
    deterministic (eta=0) sampler onto x0's trajectory."""
    sched, p = _params(steps=25, eta=0.0)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (1, 3, 8, 8, 4), dtype=jnp.float32)

    sa = p.sqrt_ac_t
    s1m = p.sqrt_1mac_t

    def perfect_model(x, t_b):
        # v consistent with x being on x0's trajectory at this t:
        # noise = (x - sa*x0)/s1m ; v = sa*noise - s1m*x0
        # closed form: v = (sa*x - x0) / s1m  ... derive:
        #   sa*(x - sa*x0)/s1m - s1m*x0 = (sa*x - sa^2*x0 - (1-sa^2)*x0)/s1m
        #                               = (sa*x - x0)/s1m
        # indexed by matching t against the schedule arrays
        idx = jnp.argmax(p.ts == t_b[0])
        return {"cond": (sa[idx] * x - x0) / s1m[idx]}

    x_T = jax.random.normal(jax.random.PRNGKey(2), x0.shape, dtype=jnp.float32)
    out = ddim_sample(perfect_model, p, x_T, jax.random.PRNGKey(3))
    # final latent = sqrt(a_first)*x0 + sqrt(1-a_first)*eps_consistent; with the
    # trailing schedule a_last-step is alphas_cumprod[~39] ~ 0.97 — the output
    # is dominated by x0. Check strong agreement.
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(x0).ravel())[0, 1]
    assert corr > 0.99


def test_batched_cfg_equals_sequential():
    sched, p = _params(steps=5, eta=0.0)
    key = jax.random.PRNGKey(4)
    x_T = jax.random.normal(key, (2, 2, 4, 4, 4), dtype=jnp.float32)

    w = jax.random.normal(jax.random.PRNGKey(5), (4, 4), dtype=jnp.float32)

    def apply_model(x, t, cond):
        # a toy "UNet": linear map on channels + conditioning bias
        return jnp.einsum("bthwc,cd->bthwd", x, w) + cond["bias"][:, None, None, None, :]

    cond = {"bias": jnp.ones((2, 4))}
    uncond = {"bias": jnp.zeros((2, 4))}

    fn_b = make_cfg_model_fn(apply_model, cond, uncond, batched_cfg=True)
    fn_s = make_cfg_model_fn(apply_model, cond, uncond, batched_cfg=False)
    out_b = ddim_sample(fn_b, p, x_T, jax.random.PRNGKey(6), guidance_scale=4.0)
    out_s = ddim_sample(fn_s, p, x_T, jax.random.PRNGKey(6), guidance_scale=4.0)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s), rtol=1e-5, atol=1e-6)


def test_three_way_cfg_combination():
    sched, p = _params(steps=1, eta=0.0)
    x = jnp.zeros((1, 2, 2, 2, 4))
    vc, vu, vui = (jnp.full_like(x, v) for v in (3.0, 1.0, 2.0))

    def model_fn(xx, tt):
        return {"cond": vc, "uncond": vu, "uncond_img": vui}

    # combination from ddim_multiplecond.py:210-234:
    # e = uc + cfg_img*(uc_img - uc) + s*(c - uc_img)
    s, ci = 7.5, 1.5
    expect_v = 1.0 + ci * (2.0 - 1.0) + s * (3.0 - 2.0)
    out = ddim_sample(
        model_fn, p, x, jax.random.PRNGKey(0), guidance_scale=s, cfg_img=ci
    )
    # x=0 -> e_t = s1m*0 + sa*v ; pred_x0 = -s1m*v ; reconstruct expectation
    a_t = float(p.a_t[0]); a_prev = float(p.a_prev[0])
    sac, s1m = np.sqrt(a_t), np.sqrt(1 - a_t)
    e_t = sac * expect_v
    pred_x0 = -s1m * expect_v
    expect = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e_t
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_rescale_noise_cfg():
    rng = np.random.RandomState(7)
    cfg_noise = jnp.asarray(rng.randn(2, 3, 4, 4, 4).astype(np.float32)) * 3.0
    text_noise = jnp.asarray(rng.randn(2, 3, 4, 4, 4).astype(np.float32))
    out = rescale_noise_cfg(cfg_noise, text_noise, 1.0)
    # full rescale: std matches text stream per-sample
    for i in range(2):
        np.testing.assert_allclose(
            np.std(np.asarray(out[i])), np.std(np.asarray(text_noise[i])), rtol=1e-4
        )
    out_half = rescale_noise_cfg(cfg_noise, text_noise, 0.0)
    np.testing.assert_allclose(np.asarray(out_half), np.asarray(cfg_noise))


def test_eta_noise_is_deterministic_given_key():
    sched, p = _params(steps=5, eta=1.0)
    x_T = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 4, 4, 4))

    def model_fn(x, t):
        return {"cond": x * 0.1}

    o1 = ddim_sample(model_fn, p, x_T, jax.random.PRNGKey(9))
    o2 = ddim_sample(model_fn, p, x_T, jax.random.PRNGKey(9))
    o3 = ddim_sample(model_fn, p, x_T, jax.random.PRNGKey(10))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
