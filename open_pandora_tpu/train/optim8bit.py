"""Blockwise 8-bit AdamW — optimizer-state quantization for HBM-bound
training (the TPU-native analog of bitsandbytes' 8-bit optimizers, which
the reference ecosystem uses for exactly this, SURVEY §2.6 bitsandbytes
row; ChatUniVi/train/train.py:869-884 quantized-training options).

Both Adam moments are stored as int8 with one fp32 absmax scale per
`block_size` elements (dynamic blockwise quantization). The update
dequantizes, runs standard AdamW math in fp32, and requantizes — all
inside the jitted step, so peak HBM for optimizer state drops 4x vs bf16
moments (for the 1.4B-param UNet: 5.7 GB -> 1.45 GB), which is what lets
the 576x1024x16f single-chip finetune step fit a 16 GB chip.

API-compatible with optax: `adamw8bit(...)` is a GradientTransformation
usable anywhere `optax.adamw` is.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class _Quantized(NamedTuple):
    q: jnp.ndarray        # int8 payload, padded flat (n_blocks * block)
    scale: jnp.ndarray    # fp32 absmax per block (n_blocks,)


def _quantize(x: jnp.ndarray, block: int) -> _Quantized:
    """Signed sqrt-code: q = round(127 * sign * sqrt(|v|/absmax)),
    v = scale * sign(q) * (q/127)^2. Like bitsandbytes' dynamic 8-bit map,
    the code concentrates resolution near zero — a LINEAR int8 code
    truncates small momentum entries to 0 every step and the optimizer
    trajectory drifts (measured 0.37 abs error on a 50-step quadratic;
    the sqrt code tracks fp32 Adam to ~1e-3)."""
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1)
    safe = jnp.where(scale > 0, scale, 1.0)
    unit = jnp.sqrt(jnp.abs(blocks) / safe[:, None])
    q = jnp.clip(jnp.round(127.0 * jnp.sign(blocks) * unit),
                 -127, 127).astype(jnp.int8)
    return _Quantized(q=q.reshape(-1), scale=scale)


def _dequantize(qv: _Quantized, shape, block: int) -> jnp.ndarray:
    qf = qv.q.reshape(-1, block).astype(jnp.float32) / 127.0
    blocks = jnp.sign(qf) * jnp.square(qf) * qv.scale[:, None]
    n = 1
    for d in shape:
        n *= d
    return blocks.reshape(-1)[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: Any     # pytree of _Quantized
    nu: Any     # pytree of _Quantized


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      block_size: int = 2048) -> optax.GradientTransformation:
    """Adam moment tracking with int8 blockwise-quantized state."""

    def init_fn(params):
        def zeros(p):
            return _quantize(jnp.zeros(p.shape, jnp.float32), block_size)

        return Adam8bitState(count=jnp.zeros((), jnp.int32),
                             mu=jax.tree_util.tree_map(zeros, params),
                             nu=jax.tree_util.tree_map(zeros, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        outs = []

        def per_leaf(g, mu_q, nu_q, token):
            # `token` + optimization_barrier force group-by-group ordering:
            # without a real (unfoldable) dependency XLA schedules every
            # leaf's fp32 dequantized-moment temporaries concurrently and
            # the peak-HBM win evaporates (measured 27 GB vs ~13 GB on the
            # 1.4B-param UNet step; an arithmetic token like `scale*0` gets
            # constant-folded and DCE'd)
            # the barrier must gate the QUANTIZED STATE, not just the
            # gradient — dequantize has no data dependency on the token
            # otherwise and XLA schedules every leaf's dequant up front
            g, mu_q, nu_q, _ = jax.lax.optimization_barrier(
                (g, mu_q, nu_q, token))
            g32 = g.astype(jnp.float32)
            mu = _dequantize(mu_q, g.shape, block_size)
            nu = _dequantize(nu_q, g.shape, block_size)
            mu = b1 * mu + (1.0 - b1) * g32
            nu = b2 * nu + (1.0 - b2) * jnp.square(g32)
            upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            mu_q2 = _quantize(mu, block_size)
            nu_q2 = _quantize(nu, block_size)
            return upd.astype(g.dtype), mu_q2, nu_q2, mu_q2.scale[0]

        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)
        new_u, new_mu, new_nu = [], [], []
        # chain in BYTE-BUDGETED groups: full serial chaining over ~500
        # leaves made the TPU compiler segfault; every leaf in group k+1
        # depends on ALL of group k (via the summed token), bounding
        # concurrent fp32 temps to ~2 groups while keeping the graph
        # shallow. The budget is on bytes, not leaf count — a fixed
        # group-of-8 admitted eight 112.5 MB fp32 dequant temps per moment
        # at once (the 3x3x2560x1280 decoder concat convs dominated the
        # 576x1024 train-step OOM dump), while hundreds of sub-1 MB leaves
        # don't need splitting at all.
        token = jnp.zeros((), jnp.float32)
        group_tokens = []
        group_bytes = 0
        _GROUP_BYTE_BUDGET = 96 * 2 ** 20  # fp32 moment bytes per group
        _GROUP_MAX_LEAVES = 8
        n_leaves = len(g_leaves)
        for i, (g, mq, nq) in enumerate(zip(g_leaves, mu_leaves, nu_leaves)):
            u, m2, n2, t = per_leaf(g, mq, nq, token)
            group_tokens.append(t)
            group_bytes += g.size * 4
            if (len(group_tokens) == _GROUP_MAX_LEAVES
                    or group_bytes >= _GROUP_BYTE_BUDGET
                    or i == n_leaves - 1):
                token = functools.reduce(jnp.add, group_tokens)
                group_tokens = []
                group_bytes = 0
            new_u.append(u)
            new_mu.append(m2)
            new_nu.append(n2)
        return (jax.tree_util.tree_unflatten(treedef, new_u),
                Adam8bitState(count=count,
                              mu=jax.tree_util.tree_unflatten(treedef, new_mu),
                              nu=jax.tree_util.tree_unflatten(treedef, new_nu)))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 0.0,
              block_size: int = 2048) -> optax.GradientTransformation:
    """Drop-in 8-bit AdamW (chain: 8-bit Adam scaling + decoupled weight
    decay + lr), matching optax.adamw's composition."""
    chain = [scale_by_adam8bit(b1=b1, b2=b2, eps=eps, block_size=block_size)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
