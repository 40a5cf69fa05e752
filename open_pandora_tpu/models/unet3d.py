"""DynamiCrafter UNet3D — TPU-native flax/NHWC implementation.

Behavioral spec: /root/reference/DynamiCrafter/lvdm/modules/networks/
openaimodel3d.py (UNetModel :284, ResBlock :112, TemporalConvBlock :242,
Up/Downsample :51-108, forward :552-607) and lvdm/modules/attention.py
(CrossAttention :42 incl. dual text/image KV streams :89-144,
BasicTransformerBlock :212, SpatialTransformer :249, TemporalTransformer :313,
GEGLU feed-forward :412-437).

Shipped config (configs/inference_512_v1.0.yaml): 320ch, mult (1,2,4,4),
2 res blocks/level, attn at ds 1/2/4, head_dim 64, context 1024, use_linear,
temporal conv+attention (self-only, no relative position), addition_attention
(init temporal attn), image cross-attention (non-learnable scale), fps cond.

TPU-first design:
  - NHWC; spatial stream is (b*t, h, w, c), temporal stream (b*h*w, t, c)
  - attention via ops.attention: Pallas flash for the h*w spatial stream,
    XLA for tiny-KV cross/temporal streams
  - the reference's hardcoded `77 + t*16` context split
    (openaimodel3d.py:558-567) is config: text_context_len /
    img_tokens_per_frame
  - fp32 GroupNorm/softmax statistics; params/compute dtype via policy
  - gradient checkpointing = nn.remat over transformer/res blocks when
    cfg.use_checkpoint (the reference's checkpoint wrapper common.py:81-94)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from open_pandora_tpu.core.config import UNet3DConfig
from open_pandora_tpu.diffusion.schedule import timestep_embedding
from open_pandora_tpu.ops.attention import attention
from open_pandora_tpu.ops.dual_cross_attention import (
    dual_cross_attention, dual_cross_attention_eligible)
from open_pandora_tpu.ops.packed_attention import (
    dual_cross_attention_packed, packed_attention_eligible,
    self_attention_packed)
from open_pandora_tpu.ops.norms import layer_norm

from open_pandora_tpu.core import flags


class GroupNorm32(nn.Module):
    """GN(32) with fp32 stats. eps 1e-5 in ResBlocks (torch default,
    basics.py:76-88), 1e-6 in transformer pre-norms (attention.py:265,330).

    bf16 activations on TPU route through the fused single-pass
    Pallas GN+SiLU kernel (ops/fused_norms.py); fp32 (golden mode), CPU
    and oversized slabs keep the exact two-pass XLA lowering."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, silu: bool = False, stats_only: bool = False,
                 extra=None):
        from open_pandora_tpu.ops.fused_norms import fused_group_norm_silu
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if stats_only:
            # Per-(batch, channel) affine fold for the fused conv kernel
            # (ops/conv2d.py conv3x3_fused): GN(x + extra) == x*a + b with
            #   a_c = gamma_c / sigma_g,  b_c = (e_c - mu_g)*a_c + beta_c.
            # Group stats of (x + e) from per-channel moments of x (the
            # ResBlock's emb add, openaimodel3d.py:213-218, folds in free):
            #   mu_g  = mean_{c in g}(m1_c + e_c)
            #   E[v2] = mean_{c in g}(m2_c + 2 e_c m1_c + e_c^2)
            xf = x.astype(jnp.float32)
            red = tuple(range(1, x.ndim - 1))
            m1 = jnp.mean(xf, axis=red)                       # (B, C)
            m2 = jnp.mean(jnp.square(xf), axis=red)           # (B, C)
            e = (jnp.zeros_like(m1) if extra is None
                 else extra.astype(jnp.float32))
            B = m1.shape[0]
            gshape = (B, 32, c // 32)
            mu = jnp.mean((m1 + e).reshape(gshape), axis=-1)  # (B, 32)
            ex2 = jnp.mean((m2 + 2 * e * m1 + jnp.square(e)).reshape(gshape),
                           axis=-1)
            var = ex2 - jnp.square(mu)
            inv = jax.lax.rsqrt(var + self.eps)               # (B, 32)
            mu = jnp.repeat(mu, c // 32, axis=-1)             # (B, C)
            inv = jnp.repeat(inv, c // 32, axis=-1)
            a = scale.astype(jnp.float32) * inv
            bsh = (e - mu) * a + bias.astype(jnp.float32)
            return a, bsh
        return fused_group_norm_silu(x, scale, bias, num_groups=32,
                                     eps=self.eps, silu=silu)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, eps=self.eps)


def zeros_init():
    return nn.initializers.zeros


class CrossAttention(nn.Module):
    """attention.py:42-144. context=None -> self-attention. With
    image_cross_attention and a context, the context is split into
    [text (text_len tokens) | image (rest)], each with its own KV
    projection; outputs are summed with an optional learnable tanh gate
    (attention.py:138-142)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    image_ca_scale_learnable: bool = False
    text_context_len: int = 77
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True, mask=None):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        self_attn = context is None
        ctx = x if self_attn else context

        b, n, _ = x.shape
        qh = q.reshape(b, n, self.heads, self.dim_head)

        if self.image_cross_attention and not self_attn:
            ctx_text = ctx[:, : self.text_context_len]
            ctx_img = ctx[:, self.text_context_len:]
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx_text)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx_text)
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(ctx_img)
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(ctx_img)
            m = ctx_text.shape[1]
            mi = ctx_img.shape[1]
            gate = jnp.ones((), self.dtype)
            if self.image_ca_scale_learnable:
                alpha = self.param("alpha", nn.initializers.zeros, ())
                gate = jnp.tanh(alpha) + 1.0
            fast = (deterministic and x.dtype == jnp.bfloat16
                    and _fused_available())
            if fast and packed_attention_eligible(
                    n, (m, mi), self.heads, inner):
                # eval fast path, packed layout: one kernel computes both
                # KV streams' softmax-attention per q block and fuses the
                # gated add, consuming the (b, n, h*d) projections as-is —
                # no head-split reshape or (b,h,n,d) relayout copies
                out = dual_cross_attention_packed(
                    q, k, v, k_ip, v_ip, gate, heads=self.heads)
            elif fast and dual_cross_attention_eligible(
                    n, m, mi, self.dim_head):
                kh = k.reshape(b, m, self.heads, self.dim_head)
                vh = v.reshape(b, m, self.heads, self.dim_head)
                kih = k_ip.reshape(b, mi, self.heads, self.dim_head)
                vih = v_ip.reshape(b, mi, self.heads, self.dim_head)
                out = dual_cross_attention(qh, kh, vh, kih, vih, gate)
                out = out.reshape(b, n, inner)
            else:
                kh = k.reshape(b, m, self.heads, self.dim_head)
                vh = v.reshape(b, m, self.heads, self.dim_head)
                kih = k_ip.reshape(b, mi, self.heads, self.dim_head)
                vih = v_ip.reshape(b, mi, self.heads, self.dim_head)
                out = attention(qh, kh, vh)
                out_ip = attention(qh, kih, vih)
                out = (out + gate * out_ip.astype(out.dtype)
                       ).reshape(b, n, inner)
        else:
            if not self_attn:
                ctx = ctx[:, : self.text_context_len]
            m = ctx.shape[1]
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
            if (deterministic and x.dtype == jnp.bfloat16 and mask is None
                    and _fused_available()
                    and packed_attention_eligible(n, (m,), self.heads,
                                                  inner)):
                # packed-layout kernel: the spatial self-attention (and
                # 77-token text cross-attn) without the head-split reshape
                # and (b,h,n,d) relayout copies around the flash kernel
                out = self_attention_packed(q, k, v, heads=self.heads)
            else:
                out = attention(qh, k.reshape(b, m, self.heads, self.dim_head),
                                v.reshape(b, m, self.heads, self.dim_head),
                                mask=mask)
                out = out.reshape(b, n, inner)

        out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out_0")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class _DenseParams(nn.Module):
    """Param-holder producing the exact {kernel[, bias]} structure of
    nn.Dense — lets the fused temporal kernel consume raw weights while the
    training/XLA path keeps using real Dense modules over the SAME tree."""

    features: int
    in_dim: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class _LNParams(nn.Module):
    @nn.compact
    def __call__(self, dim):
        return (self.param("scale", nn.initializers.ones, (dim,)),
                self.param("bias", nn.initializers.zeros, (dim,)))


class FeedForward(nn.Module):
    """GEGLU FF (attention.py:412-437): Dense(2*4d) -> gelu-gate -> Dense(d).

    At 576x1024 the temporal-site FF intermediate is (9216, 16, 2*4*1280) =
    1.5G elements — the single biggest HBM temp in the training backward
    (it OOMed the 16 GB chip). When the intermediate exceeds the threshold
    the leading token axis is processed in chunks sharing one set of Dense
    params; remat then recomputes per chunk, bounding live activations."""

    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    # elements of the GEGLU intermediate above which chunking kicks in
    # (256M elems = 512 MB bf16); chunks target <= 128M elems each
    CHUNK_THRESHOLD = 256 * 2 ** 20
    CHUNK_TARGET = 128 * 2 ** 20

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        inner = d * self.mult
        proj_in = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")
        proj_out = nn.Dense(d, dtype=self.dtype, name="net_2")

        def ff(chunk):
            h = proj_in(chunk)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate, approximate=False)  # torch F.gelu: erf
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            return proj_out(h)

        import math
        n = x.shape[0]
        elems = math.prod(x.shape[:-1]) * inner * 2
        if elems <= self.CHUNK_THRESHOLD:
            return ff(x)
        chunks = 2
        while elems // chunks > self.CHUNK_TARGET and (
                n % (chunks * 2) == 0):
            chunks *= 2
        if n % chunks:
            return ff(x)
        step = n // chunks
        return jnp.concatenate(
            [ff(x[i * step:(i + 1) * step]) for i in range(chunks)], axis=0)


class BasicTransformerBlock(nn.Module):
    """pre-LN self-attn -> cross-attn -> GEGLU FF (attention.py:212-246).

    With `fused_temporal` (temporal sites: self-attention over t, no
    context, no mask) and deterministic execution on TPU, both attentions
    run through ops.fused_temporal — one Pallas kernel fusing
    LN+QKV+packed-attention+out-proj+residual (~2x over the XLA chain on
    v5e). The param tree is identical either way."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    image_ca_scale_learnable: bool = False
    text_context_len: int = 77
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_temporal: bool = False

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True,
                 self_mask=None):
        inner = self.heads * self.dim_head
        dim = x.shape[-1]
        use_fused = (
            self.fused_temporal and context is None and self_mask is None
            and _fused_temporal_ok(x.shape[1], dim, inner, x.dtype,
                                   deterministic))
        if use_fused:
            from open_pandora_tpu.ops.fused_temporal import (
                fused_temporal_self_attention,
                fused_temporal_self_attention_native)
            # 4-D input = the native (b, t, hw, c) temporal stream (see
            # TemporalTransformer) — attention windows are gathered by the
            # kernel's strided BlockSpec instead of a global transpose
            fn = (fused_temporal_self_attention_native if x.ndim == 4
                  else fused_temporal_self_attention)
            for attn_name, norm_name in (("attn1", "norm1"),
                                         ("attn2", "norm2")):
                g, b = _LNParams(name=norm_name)(dim)
                hold = _AttnParams(dim, inner, name=attn_name)
                wq, wk, wv, wo, bo = hold()
                x = fn(
                    x, wq.astype(self.dtype), wk.astype(self.dtype),
                    wv.astype(self.dtype), wo.astype(self.dtype),
                    bo.astype(self.dtype), g, b, heads=self.heads)
        else:
            attn_cls = CrossAttention
            if flags.flag("PANDORA_FINE_REMAT") and not deterministic:
                # nested remat for memory-critical training (576x1024):
                # checkpoint each attention/FF separately so one block's
                # backward never materializes attn1 + attn2 + FF
                # temporaries together (the measured 2026-08-19 771 MB HBM
                # shortfall was exactly the L0 spatial block's coexisting
                # fp32 attention temps + relayout copies)
                attn_cls = nn.remat(CrossAttention, static_argnums=(3,))
            x = x + attn_cls(
                heads=self.heads, dim_head=self.dim_head, dropout=self.dropout,
                dtype=self.dtype, name="attn1",
            )(LayerNorm(name="norm1")(x), None, deterministic, self_mask)
            x = x + attn_cls(
                heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim,
                image_cross_attention=self.image_cross_attention,
                image_ca_scale_learnable=self.image_ca_scale_learnable,
                text_context_len=self.text_context_len,
                dropout=self.dropout, dtype=self.dtype, name="attn2",
            )(LayerNorm(name="norm2")(x), context, deterministic)
            # context=None -> CrossAttention self-attends on the NORMED
            # input (attention.py:243-244 passes norm2(x) and CrossAttention
            # defaults context to it) — not on the raw residual stream.
        # NOTE (round-3 measurement): the GEGLU FF stays on plain XLA on
        # purpose. A fully fused Pallas LN+GEGLU+residual kernel
        # (ops/fused_geglu.py) measured 10-20x SLOWER than the XLA lowering
        # at every UNet shape on v5e, and the in-program XLA FF is fast once
        # neighboring convs pin sane layouts (tconv+ff3d chain: 2.4 ms at
        # the level-0 temporal shape vs 21 ms for an isolated 3D FF).
        ff_cls = (nn.remat(FeedForward, static_argnums=(2,))
                  if flags.flag("PANDORA_FINE_REMAT")
                  and not deterministic else FeedForward)
        x = x + ff_cls(dropout=self.dropout, dtype=self.dtype, name="ff")(
            LayerNorm(name="norm3")(x), deterministic)
        return x


class _AttnParams(nn.Module):
    """Param tree twin of CrossAttention's to_q/to_k/to_v/to_out_0."""

    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        wq, _ = _DenseParams(self.inner, self.dim, name="to_q")()
        wk, _ = _DenseParams(self.inner, self.dim, name="to_k")()
        wv, _ = _DenseParams(self.inner, self.dim, name="to_v")()
        wo, bo = _DenseParams(self.dim, self.inner, use_bias=True,
                              name="to_out_0")()
        return wq, wk, wv, wo, bo


def _fused_temporal_ok(t: int, dim: int, inner: int, dtype,
                       deterministic: bool) -> bool:
    """Shared eligibility for the fused temporal-attention kernel: callers
    that pick the native 4-D stream (TemporalTransformer) must agree with
    BasicTransformerBlock's routing, or a 4-D input would fall through to
    the 3-D CrossAttention twin."""
    return (deterministic and t <= 32
            and dim * inner <= 640 * 1280
            and dtype == jnp.bfloat16  # golden fp32 mode uses the XLA twin
            and _fused_available())


def _fused_available() -> bool:

    if flags.flag("PANDORA_DISABLE_FUSED"):
        return False
    # the axon platform registers TPU devices even when tests pin the CPU
    # default device — honor the default-device override first
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform == "tpu"
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


class SpatialTransformer(nn.Module):
    """attention.py:249-310 with use_linear=True (shipped config)."""

    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    image_ca_scale_learnable: bool = False
    text_context_len: int = 77
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        # x: (bt, h, w, c)
        bt, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        y = GroupNorm32(eps=1e-6, name="norm")(x)
        y = y.reshape(bt, h * w, c)
        y = nn.Dense(inner, dtype=self.dtype, name="proj_in")(y)
        for d in range(self.depth):
            y = BasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim,
                image_cross_attention=self.image_cross_attention,
                image_ca_scale_learnable=self.image_ca_scale_learnable,
                text_context_len=self.text_context_len,
                dropout=self.dropout, dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(y, context, deterministic)
        y = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="proj_out")(y)
        return x_in + y.reshape(bt, h, w, c)


class TemporalTransformer(nn.Module):
    """attention.py:313-410, only_self_att=True path: self-attention over the
    t axis, batched over b*h*w; use_linear projections; optional causal mask."""

    heads: int
    dim_head: int
    depth: int = 1
    causal: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (b, t, h, w, c)
        b, t, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        y = GroupNorm32(eps=1e-6, name="norm")(x)
        # Native-layout fast path: proj_in/out, LN and the GEGLU FF are
        # row-order agnostic, and the fused attention kernel gathers its
        # (t, group) windows via a strided BlockSpec — so when every block
        # routes to the kernel we can stay in (b, t, h*w, *) and skip the
        # two full-stream (b,h,w,t,c) transposes entirely.
        native = (not self.causal and (h * w) % 32 == 0
                  and _fused_temporal_ok(t, inner, inner, self.dtype,
                                         deterministic)
                  and not flags.flag("PANDORA_DISABLE_TNATIVE"))
        if native:
            y = y.reshape(b, t, h * w, c)
        else:
            # (b, h, w, t, c) -> (b*h*w, t, c)
            y = y.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        # Apply the use_linear projections on a 2-D flattening of the
        # stream: a dot_general over the 4-D native layout lowers through
        # XLA:TPU's convolution emitter (EmitOutputBatchInLanes..., ~4% MXU,
        # ~2 ms/site at level 0 plus a layout copy back); the reshape is a
        # free row-major bitcast and the 2-D dot is a plain MXU matmul.
        def _proj(layer, z):
            return layer(z.reshape(-1, z.shape[-1])).reshape(
                *z.shape[:-1], layer.features)

        y = _proj(nn.Dense(inner, dtype=self.dtype, name="proj_in"), y)
        mask = None
        if self.causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            mask = (col <= row)[None, None]  # (1, 1, t, t)
        for d in range(self.depth):
            y = BasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype,
                fused_temporal=not self.causal,
                name=f"transformer_blocks_{d}",
            )(y, None, deterministic, self_mask=mask)
        y = _proj(nn.Dense(c, kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="proj_out"), y)
        if native:
            y = y.reshape(b, t, h, w, c)
        else:
            y = y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x_in + y


class _SConv3x3(nn.Module):
    """Stride-1 same-pad 3x3 spatial conv with the Pallas direct kernel on
    eligible TPU shapes (ops/conv2d.py: nine accumulated MXU dots over an
    in-VMEM slab — the conv-MXU attack, PERF.md round 4) and the XLA conv
    elsewhere. Param tree identical to nn.Conv ({kernel: (3,3,cin,cout),
    bias: (cout,)}) so checkpoints are interchangeable."""

    features: int
    zero: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fast: bool = False, prologue=None, residual=None):

        from open_pandora_tpu.ops.attention import _on_tpu
        from open_pandora_tpu.ops.conv2d import (CENSUS, conv3x3_eligible,
                                                 conv3x3_fused,
                                                 conv3x3_fused_eligible,
                                                 conv3x3_nhwc)
        c_in = x.shape[-1]
        if flags.flag("PANDORA_CONV_CENSUS"):
            CENSUS.add((x.shape[1], x.shape[2], c_in, self.features))
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero
            else nn.initializers.lecun_normal(),
            (3, 3, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # fast (eval-only): the Pallas kernels have no VJP — training paths
        # (deterministic=False) keep the differentiable XLA conv.
        # prologue=(a, b): caller-folded GN(+emb)+SiLU, fused in-kernel when
        # routed; residual: the ResBlock skip, added in the kernel epilogue.
        if (fast and _on_tpu()
                and conv3x3_fused_eligible(x.shape[1], x.shape[2], c_in,
                                           self.features)):
            a, sh = prologue if prologue is not None else (None, None)
            return conv3x3_fused(x, jnp.asarray(kernel), jnp.asarray(bias),
                                 scale=a, shift=sh, residual=residual)
        if prologue is not None:  # un-fuse: affine+silu on XLA
            a, sh = prologue
            xf = x.astype(jnp.float32) * a[:, None, None, :] \
                + sh[:, None, None, :]
            x = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
        if (fast and _on_tpu()
                and conv3x3_eligible(x.shape[1], x.shape[2], c_in,
                                     self.features)):
            y = conv3x3_nhwc(x, jnp.asarray(kernel), jnp.asarray(bias))
            return y if residual is None else y + residual.astype(y.dtype)
        if flags.flag("PANDORA_SPATIAL_DOT"):
            from open_pandora_tpu.ops.conv2d import conv3x3_ninedot
            y = conv3x3_ninedot(x, jnp.asarray(kernel), jnp.asarray(bias))
            return y if residual is None else y + residual.astype(y.dtype)
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(kernel, self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.asarray(bias, y.dtype)
        return y if residual is None else y + residual.astype(y.dtype)


class _TConv3(nn.Module):
    """k=(3,1,1) temporal conv as three shifted t-axis matmuls.

    Param tree is identical to nn.Conv's ({kernel: (3,1,1,cin,cout),
    bias: (cout,)}), so checkpoints are interchangeable with the Conv3D
    twin below. Why not Conv3D: XLA:TPU canonicalizes the (3,1,1) window
    into a 1-D conv over t and materializes (b,h,w,t,c) relayouts of the
    full activation on both sides — measured ~24 ms/eval of 5-D transpose
    fusions plus 39% MXU convs at 320x512 on v5e. Three layout-preserving
    dots over the padded t axis compute the same cross-correlation taps
    with zero data movement and long-M matmul tiling. Measured alternative
    on v5e (320x512 eval): single concat-tap dot + shifted output adds =
    272.7 ms (the 3*cout-wide intermediate costs more HBM than it saves
    in layout churn); this form = 262.6 ms; Conv3D = 276.9 ms."""

    features: int
    zero: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero
            else nn.initializers.lecun_normal(),
            (3, 1, 1, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = jnp.asarray(kernel, self.dtype)[:, 0, 0]  # (3, cin, cout)
        t = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        y = (xp[:, :t] @ w[0] + xp[:, 1:t + 1] @ w[1]
             + xp[:, 2:t + 2] @ w[2])
        return y + jnp.asarray(bias, y.dtype)


class TemporalConvBlock(nn.Module):
    """4x (GN + SiLU + Conv3d k=(3,1,1)) residual, zero-init final conv
    (openaimodel3d.py:242-281). x: (b, t, h, w, c)."""

    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        use_dot = not flags.flag("PANDORA_DISABLE_TCONV_DOT")

        def conv3(name, zero=False):
            if use_dot:
                return _TConv3(features=c, zero=zero, dtype=self.dtype,
                               name=name)
            return nn.Conv(
                c, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                kernel_init=nn.initializers.zeros if zero
                else nn.initializers.lecun_normal(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype, name=name)

        ident = x
        h = GroupNorm32(name="conv1_norm")(x, silu=True)
        h = conv3("conv1")(h)
        for i, zero in ((2, False), (3, False), (4, True)):
            h = GroupNorm32(name=f"conv{i}_norm")(h, silu=True)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = conv3(f"conv{i}", zero)(h)
        return ident + h


class ResBlock(nn.Module):
    """openaimodel3d.py:112-240: GN+SiLU+conv, +emb, GN+SiLU+drop+zeroconv,
    skip; optional temporal conv afterwards. x: (bt, h, w, c), emb: (bt, e)."""

    out_ch: int
    use_temporal_conv: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, batch_size: int, deterministic: bool = True):
        from open_pandora_tpu.ops.attention import _on_tpu
        from open_pandora_tpu.ops.conv2d import conv3x3_fused_eligible

        def fused_route(c_in, c_out):
            # eval-only (kernel has no VJP); dropout is identity there, so
            # GN+SiLU(+emb)+conv(+skip) collapse into one kernel call
            return (deterministic and _on_tpu()
                    and conv3x3_fused_eligible(x.shape[1], x.shape[2],
                                               c_in, c_out))

        in_ch = x.shape[-1]
        if fused_route(in_ch, self.out_ch):
            pro = GroupNorm32(name="in_norm")(x, silu=True, stats_only=True)
            h = _SConv3x3(self.out_ch, dtype=self.dtype, name="in_conv")(
                x, fast=True, prologue=pro)
        else:
            h = GroupNorm32(name="in_norm")(x, silu=True)
            h = _SConv3x3(self.out_ch, dtype=self.dtype,
                          name="in_conv")(h, fast=deterministic)
        e = nn.Dense(self.out_ch, dtype=self.dtype, name="emb_layers_1")(
            jax.nn.silu(emb))
        if fused_route(self.out_ch, self.out_ch):
            skip = (x if in_ch == self.out_ch else
                    nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                            name="skip_connection")(x))
            pro = GroupNorm32(name="out_norm")(
                h, silu=True, stats_only=True, extra=e.astype(jnp.float32))
            h = _SConv3x3(self.out_ch, zero=True, dtype=self.dtype,
                          name="out_conv")(h, fast=True, prologue=pro,
                                           residual=skip)
        else:
            h = h + e[:, None, None, :].astype(h.dtype)
            h = GroupNorm32(name="out_norm")(h, silu=True)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _SConv3x3(self.out_ch, zero=True, dtype=self.dtype,
                          name="out_conv")(h, fast=deterministic)
            if in_ch != self.out_ch:
                x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                            name="skip_connection")(x)
            h = x + h
        if self.use_temporal_conv:
            bt, hh, ww, c = h.shape
            t = bt // batch_size
            hv = h.reshape(batch_size, t, hh, ww, c)
            hv = TemporalConvBlock(dropout=0.1, dtype=self.dtype,
                                   name="temporal_conv")(hv, deterministic)
            h = hv.reshape(bt, hh, ww, c)
        return h


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    """Nearest 2x (computed fp32, openaimodel3d.py:100-106) + conv."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fast: bool = False):
        b, h, w, c = x.shape
        dt = x.dtype
        y = jax.image.resize(x.astype(jnp.float32), (b, h * 2, w * 2, c),
                             method="nearest").astype(dt)
        return _SConv3x3(c, dtype=self.dtype, name="conv")(y, fast=fast)


class UNetModel(nn.Module):
    """The full UNet3D (openaimodel3d.py:284-607)."""

    cfg: UNet3DConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (b, t, h, w, c_in)  latent+concat-cond
        timesteps: jnp.ndarray,    # (b,)
        context: jnp.ndarray,      # (b, L, context_dim)
        fs: Optional[jnp.ndarray] = None,  # (b,) frame-stride/fps cond
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, t, hh, ww, _ = x.shape
        mc = cfg.model_channels
        time_embed_dim = mc * 4

        t_emb = timestep_embedding(timesteps, mc).astype(self.dtype)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(
            jax.nn.silu(emb))

        if cfg.fs_condition:
            if fs is None:
                fs = jnp.full((b,), cfg.default_fs, dtype=jnp.int32)
            fs_emb = timestep_embedding(fs, mc).astype(self.dtype)
            fse = nn.Dense(time_embed_dim, dtype=self.dtype,
                           name="fps_embedding_0")(fs_emb)
            fse = nn.Dense(time_embed_dim, kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="fps_embedding_2")(
                jax.nn.silu(fse))
            emb = emb + fse

        # context split: [text | per-frame image tokens]
        L = context.shape[1]
        per_frame_ctx = cfg.text_context_len + t * cfg.img_tokens_per_frame
        if L == per_frame_ctx:
            ctx_text = context[:, : cfg.text_context_len]
            ctx_img = context[:, cfg.text_context_len:]
            ctx_text = jnp.repeat(ctx_text, t, axis=0)  # (b*t, 77, d)
            ctx_img = ctx_img.reshape(b * t, cfg.img_tokens_per_frame, -1)
            ctx = jnp.concatenate([ctx_text, ctx_img], axis=1)
        else:
            ctx = jnp.repeat(context, t, axis=0)
        emb_bt = jnp.repeat(emb, t, axis=0)  # (b*t, e)

        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)

        # gradient checkpointing over res/transformer blocks during training
        # (reference checkpoint wrapper common.py:81-94, use_checkpoint: True)
        use_remat = cfg.use_checkpoint and not deterministic
        res_cls = nn.remat(ResBlock, static_argnums=(3, 4)) if use_remat \
            else ResBlock
        spatial_cls = nn.remat(SpatialTransformer, static_argnums=(3,)) \
            if use_remat else SpatialTransformer
        temporal_cls = nn.remat(TemporalTransformer, static_argnums=(2,)) \
            if use_remat else TemporalTransformer

        def make_res(out_ch, name):
            return res_cls(out_ch=out_ch, use_temporal_conv=cfg.temporal_conv,
                           dropout=cfg.dropout, dtype=self.dtype, name=name)

        def make_spatial(ch, name):
            heads = ch // cfg.num_head_channels
            return spatial_cls(
                heads=heads, dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth, context_dim=cfg.context_dim,
                image_cross_attention=cfg.image_cross_attention,
                image_ca_scale_learnable=cfg.image_cross_attention_scale_learnable,
                text_context_len=cfg.text_context_len,
                dropout=cfg.dropout, dtype=self.dtype, name=name)

        def make_temporal(ch, name, heads=None):
            heads = heads if heads is not None else ch // cfg.num_head_channels
            return temporal_cls(
                heads=heads, dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth, causal=cfg.use_causal_attention,
                dropout=cfg.dropout, dtype=self.dtype, name=name)

        def temporal_apply(h, mod):
            bt, sh, sw, c = h.shape
            hv = h.reshape(b, t, sh, sw, c)
            return mod(hv, deterministic).reshape(bt, sh, sw, c)

        # ---- input blocks ----
        h = _SConv3x3(mc, dtype=self.dtype,
                      name="input_blocks_0_0")(h, fast=deterministic)
        if cfg.addition_attention:
            h = temporal_apply(h, make_temporal(mc, "init_attn", heads=8))
        hs = [h]
        ch = mc
        ds = 1
        block_idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                h = make_res(mult * mc, f"input_blocks_{block_idx}_0")(
                    h, emb_bt, b, deterministic)
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    h = make_spatial(ch, f"input_blocks_{block_idx}_1")(
                        h, ctx, deterministic)
                    if cfg.temporal_attention:
                        h = temporal_apply(
                            h, make_temporal(ch, f"input_blocks_{block_idx}_2"))
                hs.append(h)
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(dtype=self.dtype,
                               name=f"input_blocks_{block_idx}_0")(h)
                hs.append(h)
                block_idx += 1
                ds *= 2

        # ---- middle ----
        h = make_res(ch, "middle_block_0")(h, emb_bt, b, deterministic)
        h = make_spatial(ch, "middle_block_1")(h, ctx, deterministic)
        if cfg.temporal_attention:
            h = temporal_apply(h, make_temporal(ch, "middle_block_2"))
        h = make_res(ch, "middle_block_3")(h, emb_bt, b, deterministic)

        # ---- output blocks ----
        block_idx = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = make_res(mult * mc, f"output_blocks_{block_idx}_0")(
                    h, emb_bt, b, deterministic)
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    h = make_spatial(ch, f"output_blocks_{block_idx}_1")(
                        h, ctx, deterministic)
                    if cfg.temporal_attention:
                        h = temporal_apply(
                            h, make_temporal(ch, f"output_blocks_{block_idx}_2"))
                if level and i == cfg.num_res_blocks:
                    h = Upsample(dtype=self.dtype,
                                 name=f"output_blocks_{block_idx}_up")(
                                     h, fast=deterministic)
                    ds //= 2
                block_idx += 1

        h = GroupNorm32(name="out_norm")(h, silu=True)
        y = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="out_conv")(h)
        y = y.reshape(b, t, hh, ww, cfg.out_channels)
        return y.astype(x.dtype)
