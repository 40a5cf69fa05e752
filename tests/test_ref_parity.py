"""Cross-implementation fp32 parity against the ACTUAL reference torch code.

These tests import the reference lvdm modules from /root/reference (read-only,
used purely as an executable behavioral oracle), randomize their weights,
export ``state_dict()``, run them through ``core/convert.py``, and assert
activation parity with our flax modules. This machine-checks the
acceptance-config-1 chain (everything except released weights):

  - UNetModel        openaimodel3d.py:284   vs models/unet3d.py
  - AutoencoderKL    autoencoder.py:14      vs models/vae.py
  - Resampler        resampler.py:96        vs models/encoders.py
  - open_clip towers condition.py:179,300   vs models/encoders.py
                     (synthetic torch replicas of open_clip's exact module
                     layout — open_clip itself is not installed here)
  - DDIM trajectory  samplers/ddim.py:141   vs diffusion/ddim.py

Weight randomization keeps tensors well-conditioned (small matrices, near-
identity norms) so fp32 ULP noise does not amplify through depth; the
reference zero-inits several output layers (out conv, temporal conv4,
proj_out) which would otherwise mask conversion bugs in those layers.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/DynamiCrafter"
if not os.path.isdir(REF):
    pytest.skip("reference checkout not present", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_pandora_tpu.core import convert as C  # noqa: E402

pytestmark = [pytest.mark.refparity, pytest.mark.slow]


def rerandomize_(module: "torch.nn.Module", seed: int) -> None:
    """Replace every float tensor in the state dict with seeded gaussians.

    2d+ tensors get std 0.1 (well-conditioned small weights); 1d tensors
    (norm scales / biases) stay near their identity-ish defaults so the
    network neither collapses nor saturates.
    """
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        r = torch.randn(v.shape, generator=g, dtype=torch.float32)
        if v.ndim >= 2:
            sd[k] = r * 0.1
        else:
            base = 1.0 if k.endswith("weight") or k.endswith("gamma") else 0.0
            sd[k] = base + r * 0.05
    module.load_state_dict(sd)


def flat_f32(module: "torch.nn.Module", prefix: str) -> dict:
    return {f"{prefix}.{k}": v.detach().float().numpy()
            for k, v in module.state_dict().items()}


def to_jax(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), tree)


# ---------------------------------------------------------------------------
# UNet3D
# ---------------------------------------------------------------------------


def test_unet3d_fp32_parity():
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    from open_pandora_tpu.core.config import UNet3DConfig
    from open_pandora_tpu.models.unet3d import UNetModel

    T = 2
    kw = dict(in_channels=8, out_channels=4, model_channels=32,
              num_res_blocks=1, attention_resolutions=[1, 2], dropout=0.0,
              channel_mult=[1, 2], num_head_channels=16, transformer_depth=1,
              context_dim=32, use_linear=True, use_checkpoint=False,
              temporal_conv=True, temporal_attention=True,
              temporal_selfatt_only=True, use_relative_position=False,
              use_causal_attention=False, temporal_length=T,
              addition_attention=True, image_cross_attention=True,
              default_fs=24, fs_condition=True)
    torch.manual_seed(0)
    ref = RefUNet(**kw).float().eval()
    rerandomize_(ref, seed=7)

    cfg = UNet3DConfig(
        in_channels=8, out_channels=4, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=32, temporal_length=T,
        temporal_conv=True, temporal_attention=True, addition_attention=True,
        image_cross_attention=True, fs_condition=True, default_fs=24,
        dropout=0.0, use_checkpoint=False,
        # the reference hardcodes the dual-stream split at 77 + t*16
        # (openaimodel3d.py:558-567)
        text_context_len=77, img_tokens_per_frame=16)
    ours = UNetModel(cfg, dtype=jnp.float32)

    params = C.convert_unet(flat_f32(ref, "model.diffusion_model"), cfg)

    rs = np.random.RandomState(0)
    b, hz, wz = 1, 8, 8
    x = rs.randn(b, 8, T, hz, wz).astype(np.float32)          # b c t h w
    ctx = rs.randn(b, 77 + T * 16, 32).astype(np.float32) * 0.5
    ts = np.array([321], np.int64)
    fs = np.array([3], np.int64)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(ts),
                      context=torch.from_numpy(ctx),
                      fs=torch.from_numpy(fs)).numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))             # b t h w c
    out = ours.apply(to_jax(params), x_j, jnp.asarray(ts, jnp.int32),
                     jnp.asarray(ctx), fs=jnp.asarray(fs, jnp.int32))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)            # back to torch
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------


def test_vae_fp32_parity():
    from lvdm.models.autoencoder import AutoencoderKL as RefVAE

    from open_pandora_tpu.core.config import VAEConfig
    from open_pandora_tpu.models.vae import AutoencoderKL

    dd = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0)
    torch.manual_seed(0)
    ref = RefVAE(ddconfig=dd, lossconfig={"target": "torch.nn.Identity"},
                 embed_dim=4).float().eval()
    rerandomize_(ref, seed=11)

    cfg = VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    ours = AutoencoderKL(cfg, dtype=jnp.float32)
    params = C.convert_vae(flat_f32(ref, "first_stage_model"), cfg)

    rs = np.random.RandomState(1)
    x = (rs.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)

    with torch.no_grad():
        post = ref.encode(torch.from_numpy(x))
        z_ref = post.mode().numpy()
        dec_ref = ref.decode(torch.from_numpy(z_ref)).numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    z = ours.apply(to_jax(params), x_j, method=AutoencoderKL.encode).mode()
    np.testing.assert_allclose(np.asarray(z).transpose(0, 3, 1, 2), z_ref,
                               atol=1e-4, rtol=1e-3)
    dec = ours.apply(to_jax(params), jnp.asarray(z_ref.transpose(0, 2, 3, 1)),
                     method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec).transpose(0, 3, 1, 2), dec_ref,
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Resampler
# ---------------------------------------------------------------------------


def test_resampler_fp32_parity():
    from lvdm.modules.encoders.resampler import Resampler as RefResampler

    from open_pandora_tpu.core.config import ResamplerConfig
    from open_pandora_tpu.models.encoders import Resampler

    torch.manual_seed(0)
    ref = RefResampler(dim=32, depth=2, dim_head=16, heads=2, num_queries=2,
                       embedding_dim=48, output_dim=40, ff_mult=2,
                       video_length=3).float().eval()
    rerandomize_(ref, seed=13)

    cfg = ResamplerConfig(dim=32, depth=2, dim_head=16, heads=2,
                          num_queries=2, embedding_dim=48, output_dim=40,
                          ff_mult=2, video_length=3)
    ours = Resampler(cfg, dtype=jnp.float32)
    params = C.convert_resampler(flat_f32(ref, "image_proj_model"), depth=2)

    rs = np.random.RandomState(2)
    x = rs.randn(2, 9, 48).astype(np.float32) * 0.5
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out = ours.apply(to_jax(params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# open_clip towers (synthetic torch replicas of the exact open_clip layout)
# ---------------------------------------------------------------------------


class _OpenClipBlock(torch.nn.Module):
    """open_clip ResidualAttentionBlock: pre-LN MHA + pre-LN MLP(c_fc/c_proj),
    exact-erf GELU — the state-dict layout condition.py's towers consume."""

    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(width)
        self.attn = torch.nn.MultiheadAttention(width, heads)
        self.ln_2 = torch.nn.LayerNorm(width)
        import collections
        self.mlp = torch.nn.Sequential(collections.OrderedDict([
            ("c_fc", torch.nn.Linear(width, width * 4)),
            ("gelu", torch.nn.GELU()),
            ("c_proj", torch.nn.Linear(width * 4, width)),
        ]))

    def forward(self, x, attn_mask=None):  # x: (L, N, D)
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + y
        return x + self.mlp(self.ln_2(x))


class _OpenClipTextReplica(torch.nn.Module):
    """Matches FrozenOpenCLIPEmbedder's surface (condition.py:179-236)."""

    def __init__(self, vocab, width, layers, heads, ctx_len):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(ctx_len, width) * 0.01)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_OpenClipBlock(width, heads) for _ in range(layers)])
        self.ln_final = torch.nn.LayerNorm(width)
        mask = torch.full((ctx_len, ctx_len), float("-inf")).triu(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def forward(self, tokens, layer_idx=1):  # penultimate: layer_idx=1
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        n = len(self.transformer.resblocks) - layer_idx
        for r in self.transformer.resblocks[:n]:
            x = r(x, attn_mask=self.attn_mask)
        x = x.permute(1, 0, 2)
        return self.ln_final(x)


class _OpenClipVisualReplica(torch.nn.Module):
    """Matches FrozenOpenCLIPImageEmbedderV2's surface (condition.py:300-382):
    patch conv, cls + pos, ln_pre, resblocks; all tokens, NO ln_post."""

    def __init__(self, width, layers, heads, image_size, patch):
        super().__init__()
        grid = image_size // patch
        self.conv1 = torch.nn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(width) * 0.02)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(grid * grid + 1, width) * 0.01)
        self.ln_pre = torch.nn.LayerNorm(width)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_OpenClipBlock(width, heads) for _ in range(layers)])

    def forward(self, x):  # x: (N, 3, H, W), already preprocessed
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)
        for r in self.transformer.resblocks:
            x = r(x)
        return x.permute(1, 0, 2)


def test_openclip_text_fp32_parity():
    from open_pandora_tpu.core.config import CLIPTextConfig
    from open_pandora_tpu.models.encoders import CLIPTextEncoder

    torch.manual_seed(0)
    ref = _OpenClipTextReplica(vocab=100, width=32, layers=3, heads=2,
                               ctx_len=11).float().eval()
    rerandomize_(ref, seed=17)

    cfg = CLIPTextConfig(vocab_size=100, width=32, layers=3, heads=2,
                         context_length=11)
    ours = CLIPTextEncoder(cfg, dtype=jnp.float32)
    params = C.convert_openclip_text(flat_f32(ref, "model"), layers_run=2)

    ids = np.random.RandomState(3).randint(0, 100, (2, 11))
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids)).numpy()
    out = ours.apply(to_jax(params), jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5, rtol=1e-4)


def test_openclip_visual_fp32_parity():
    from open_pandora_tpu.core.config import CLIPVisionConfig
    from open_pandora_tpu.models.encoders import CLIPVisionEncoder

    torch.manual_seed(0)
    ref = _OpenClipVisualReplica(width=32, layers=2, heads=2, image_size=16,
                                 patch=8).float().eval()
    rerandomize_(ref, seed=19)

    cfg = CLIPVisionConfig(image_size=16, patch_size=8, width=32, layers=2,
                           heads=2)
    ours = CLIPVisionEncoder(cfg, dtype=jnp.float32)
    params = C.convert_openclip_visual(flat_f32(ref, "model.visual"),
                                       layers=2)

    x = np.random.RandomState(4).randn(2, 3, 16, 16).astype(np.float32) * 0.5
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out = ours.apply(to_jax(params), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# DDIM trajectory
# ---------------------------------------------------------------------------


class _StubDiffusion:
    """Minimal stand-in for LatentDiffusion exposing exactly the attribute
    surface DDIMSampler reads (ddim.py:24-64, 218-291), with fp32 buffers
    built by the REFERENCE's own schedule code (utils_diffusion.py) and the
    v-prediction helpers transcribed from ddpm3d.py:235-247."""

    def __init__(self, toy_denoiser):
        from lvdm.models.utils_diffusion import (make_beta_schedule,
                                                 rescale_zero_terminal_snr)

        betas = make_beta_schedule("linear", 1000, linear_start=0.00085,
                                   linear_end=0.012)
        betas = rescale_zero_terminal_snr(betas)
        betas = np.asarray(betas, dtype=np.float64)
        alphas_cumprod = np.cumprod(1.0 - betas)
        f32 = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)

        self.betas = f32(betas)
        self.alphas_cumprod = f32(alphas_cumprod)
        self.alphas_cumprod_prev = f32(np.append(1.0, alphas_cumprod[:-1]))
        self.sqrt_alphas_cumprod = f32(np.sqrt(alphas_cumprod))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1 - alphas_cumprod))
        self.log_one_minus_alphas_cumprod = f32(np.log(1 - alphas_cumprod))
        self.sqrt_recip_alphas_cumprod = torch.zeros(1000)
        self.sqrt_recipm1_alphas_cumprod = torch.zeros(1000)
        # dynamic rescale (ddpm3d.py:505-510, turning_step=400)
        self.scale_arr = f32(np.concatenate(
            [np.linspace(1.0, 0.7, 400), np.full(1000, 0.7)]))
        self.use_dynamic_rescale = True
        self.parameterization = "v"
        self.num_timesteps = 1000
        self.device = torch.device("cpu")
        self._toy = toy_denoiser

    def apply_model(self, x, t, c, **kwargs):
        return self._toy(x, t, c)

    def _extract(self, a, t, shape):
        return a.gather(-1, t).reshape(t.shape[0], *([1] * (len(shape) - 1)))

    def predict_start_from_z_and_v(self, x_t, t, v):
        return (self._extract(self.sqrt_alphas_cumprod, t, x_t.shape) * x_t
                - self._extract(self.sqrt_one_minus_alphas_cumprod, t,
                                x_t.shape) * v)

    def predict_eps_from_z_and_v(self, x_t, t, v):
        return (self._extract(self.sqrt_alphas_cumprod, t, x_t.shape) * v
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t,
                                x_t.shape) * x_t)


class _ChainStub(_StubDiffusion):
    """_StubDiffusion whose apply_model is the DiffusionWrapper hybrid
    (ddpm3d.py:1060-1081): channel-concat c_concat onto x, cross-attend the
    concatenated c_crossattn, forward fs — driving a real (tiny) reference
    UNetModel instead of a toy callable."""

    def __init__(self, unet):
        super().__init__(toy_denoiser=None)
        self._unet = unet

    def apply_model(self, x, t, c, **kwargs):
        x_in = torch.cat([x] + c["c_concat"], dim=1)
        cc = torch.cat(c["c_crossattn"], dim=1)
        return self._unet(x_in, t, context=cc, fs=kwargs.get("fs"))


def test_config1_chain_parity():
    """Acceptance-config-1 composition, machine-checked end to end: the
    REFERENCE DDIMSampler driving the reference tiny UNetModel (hybrid
    c_concat + context + fs conditioning, CFG 7.5, guidance_rescale 0.7,
    DDIM-10 uniform_trailing, eta=0) + reference AutoencoderKL decode of the
    result, vs our ddim_sample + make_cfg_model_fn (batched CFG) + converted
    UNet + decode_video. Module parity alone can't catch conditioning
    plumbing bugs (context split, c_concat layout, fs routing); the composed
    trajectory can. Spec: samplers/ddim.py:217-290, openaimodel3d.py:552-607,
    model.py:703-781."""
    from lvdm.models.autoencoder import AutoencoderKL as RefVAE
    from lvdm.models.samplers.ddim import DDIMSampler as RefDDIM
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    from open_pandora_tpu.core.config import (DiffusionConfig, UNet3DConfig,
                                              VAEConfig)
    from open_pandora_tpu.diffusion.ddim import (ddim_sample,
                                                 make_cfg_model_fn,
                                                 make_ddim_schedule)
    from open_pandora_tpu.diffusion.schedule import make_schedule
    from open_pandora_tpu.models.unet3d import UNetModel
    from open_pandora_tpu.models.vae import AutoencoderKL, decode_video

    T = 2
    kw = dict(in_channels=8, out_channels=4, model_channels=32,
              num_res_blocks=1, attention_resolutions=[1, 2], dropout=0.0,
              channel_mult=[1, 2], num_head_channels=16, transformer_depth=1,
              context_dim=32, use_linear=True, use_checkpoint=False,
              temporal_conv=True, temporal_attention=True,
              temporal_selfatt_only=True, use_relative_position=False,
              use_causal_attention=False, temporal_length=T,
              addition_attention=True, image_cross_attention=True,
              default_fs=24, fs_condition=True)
    torch.manual_seed(0)
    ref_unet = RefUNet(**kw).float().eval()
    rerandomize_(ref_unet, seed=23)

    dd_vae = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0)
    ref_vae = RefVAE(ddconfig=dd_vae,
                     lossconfig={"target": "torch.nn.Identity"},
                     embed_dim=4).float().eval()
    rerandomize_(ref_vae, seed=29)

    # shared conditioning (fp32, both sides see identical values)
    rs = np.random.RandomState(6)
    b, hz, wz = 1, 8, 8
    scale_factor = 0.18215
    x_T = rs.randn(b, 4, T, hz, wz).astype(np.float32)
    ctx_c = (rs.randn(b, 77 + T * 16, 32) * 0.5).astype(np.float32)
    ctx_u = (rs.randn(b, 77 + T * 16, 32) * 0.5).astype(np.float32)
    z_cond = rs.randn(b, 4, T, hz, wz).astype(np.float32)
    fs_np = np.array([3], np.int64)

    # --- reference chain
    stub = _ChainStub(ref_unet)
    sampler = RefDDIM(stub)
    sampler.register_buffer = (
        lambda name, attr: setattr(sampler, name,
                                   attr if isinstance(attr, torch.Tensor)
                                   else torch.tensor(np.asarray(attr),
                                                     dtype=torch.float32)))
    sampler.make_schedule(ddim_num_steps=10,
                          ddim_discretize="uniform_trailing",
                          ddim_eta=0.0, verbose=False)
    cond = {"c_crossattn": [torch.from_numpy(ctx_c)],
            "c_concat": [torch.from_numpy(z_cond)]}
    uc = {"c_crossattn": [torch.from_numpy(ctx_u)],
          "c_concat": [torch.from_numpy(z_cond)]}
    with torch.no_grad():
        z_ref, _ = sampler.ddim_sampling(
            cond, (b, 4, T, hz, wz), x_T=torch.from_numpy(x_T.copy()),
            unconditional_guidance_scale=7.5, unconditional_conditioning=uc,
            verbose=False, guidance_rescale=0.7, fs=torch.from_numpy(fs_np))
        # decode_first_stage (ddpm3d.py:669-678): 1/scale * z, per frame
        frames_ref = torch.stack(
            [ref_vae.decode(z_ref[:, :, t] / scale_factor)
             for t in range(T)], dim=2).numpy()

    # --- our chain (converted weights, product code path)
    ucfg = UNet3DConfig(
        in_channels=8, out_channels=4, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=32, temporal_length=T,
        temporal_conv=True, temporal_attention=True, addition_attention=True,
        image_cross_attention=True, fs_condition=True, default_fs=24,
        dropout=0.0, use_checkpoint=False,
        text_context_len=77, img_tokens_per_frame=16)
    ours = UNetModel(ucfg, dtype=jnp.float32)
    uparams = to_jax(C.convert_unet(flat_f32(ref_unet,
                                             "model.diffusion_model"), ucfg))
    vcfg = VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    our_vae = AutoencoderKL(vcfg, dtype=jnp.float32)
    vparams = to_jax(C.convert_vae(flat_f32(ref_vae, "first_stage_model"),
                                   vcfg))

    zc_j = jnp.asarray(z_cond.transpose(0, 2, 3, 4, 1))
    fs_j = jnp.asarray(fs_np, jnp.int32)

    def apply(x, t, ctx):
        reps = x.shape[0] // b
        x_in = jnp.concatenate(
            [x, jnp.concatenate([zc_j] * reps, axis=0)], axis=-1)
        return ours.apply(uparams, x_in, t, ctx,
                          fs=jnp.concatenate([fs_j] * reps, axis=0))

    model_fn = make_cfg_model_fn(
        apply,
        cond=jnp.asarray(ctx_c),
        uncond=jnp.asarray(ctx_u), batched_cfg=True)
    sched = make_schedule(DiffusionConfig())
    dd = make_ddim_schedule(sched, 10, eta=0.0,
                            timestep_spacing="uniform_trailing",
                            use_dynamic_rescale=True)
    z0 = ddim_sample(model_fn, dd,
                     jnp.asarray(x_T.transpose(0, 2, 3, 4, 1)),
                     jax.random.PRNGKey(0), guidance_scale=7.5,
                     guidance_rescale=0.7, parameterization="v")
    np.testing.assert_allclose(
        np.asarray(z0).transpose(0, 4, 1, 2, 3), z_ref.numpy(),
        atol=1e-4, rtol=1e-3)

    frames = decode_video(our_vae, vparams, z0, scale_factor=scale_factor)
    np.testing.assert_allclose(
        np.asarray(frames).transpose(0, 4, 1, 2, 3),
        frames_ref.transpose(0, 1, 2, 3, 4), atol=1e-3, rtol=1e-3)


def test_unet_level0_real_shape_parity():
    """One-level UNet at the REAL production width and shape — 320 model
    channels, t=16, 40x64 latents, context 77 + 16*16 = 333 x 1024 — to
    catch shape-dependent bugs the tiny parity config can't (the dual-stream
    77+16t context split at full t, head counts 320/64=5, real spatial
    sequence 2560). channel_mult=(1,) keeps it one level deep so the fp32
    CPU run stays tractable. Spec: openaimodel3d.py:552-607 (context split),
    :284-550 (block structure)."""
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    from open_pandora_tpu.core.config import UNet3DConfig
    from open_pandora_tpu.models.unet3d import UNetModel

    T = 16
    kw = dict(in_channels=8, out_channels=4, model_channels=320,
              num_res_blocks=1, attention_resolutions=[1], dropout=0.0,
              channel_mult=[1], num_head_channels=64, transformer_depth=1,
              context_dim=1024, use_linear=True, use_checkpoint=False,
              temporal_conv=True, temporal_attention=True,
              temporal_selfatt_only=True, use_relative_position=False,
              use_causal_attention=False, temporal_length=T,
              addition_attention=True, image_cross_attention=True,
              default_fs=3, fs_condition=True)
    torch.manual_seed(0)
    ref = RefUNet(**kw).float().eval()
    rerandomize_(ref, seed=31)

    cfg = UNet3DConfig(
        in_channels=8, out_channels=4, model_channels=320, channel_mult=(1,),
        num_res_blocks=1, attention_resolutions=(1,), num_head_channels=64,
        transformer_depth=1, context_dim=1024, temporal_length=T,
        temporal_conv=True, temporal_attention=True, addition_attention=True,
        image_cross_attention=True, fs_condition=True, default_fs=3,
        dropout=0.0, use_checkpoint=False,
        text_context_len=77, img_tokens_per_frame=16)
    ours = UNetModel(cfg, dtype=jnp.float32)
    params = C.convert_unet(flat_f32(ref, "model.diffusion_model"), cfg)

    rs = np.random.RandomState(7)
    b, hz, wz = 1, 40, 64
    x = rs.randn(b, 8, T, hz, wz).astype(np.float32)
    ctx = (rs.randn(b, 77 + T * 16, 1024) * 0.5).astype(np.float32)
    ts = np.array([777], np.int64)
    fs = np.array([15], np.int64)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(ts),
                      context=torch.from_numpy(ctx),
                      fs=torch.from_numpy(fs)).numpy()

    out = ours.apply(to_jax(params),
                     jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(ts, jnp.int32), jnp.asarray(ctx),
                     fs=jnp.asarray(fs, jnp.int32))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert out.shape == out_ref.shape
    # atol: at this size (2560-token attention softmax-sums, 320-ch conv
    # chains) torch-CPU vs XLA-CPU fp32 reduction order drifts to ~6e-4 on
    # unit-scale activations (measured: 0.36% of elements above 2e-4, max
    # 6.4e-4) — accumulation noise, not structure; a real composition bug
    # shows up as O(1) everywhere (tiny-config test holds 1e-4).
    np.testing.assert_allclose(out, out_ref, atol=1.5e-3, rtol=1e-3)


@pytest.mark.parametrize("spacing", ["uniform", "uniform_trailing"])
def test_ddim_trajectory_parity(spacing):
    """DDIM-10, v-param, dynamic rescale, CFG 7.5, guidance_rescale 0.7,
    eta=0, shared toy denoiser — full-trajectory fp32 parity."""
    from lvdm.models.samplers.ddim import DDIMSampler as RefDDIM

    from open_pandora_tpu.core.config import DiffusionConfig
    from open_pandora_tpu.diffusion.ddim import (ddim_sample,
                                                 make_cfg_model_fn,
                                                 make_ddim_schedule)
    from open_pandora_tpu.diffusion.schedule import make_schedule

    shape = (1, 4, 2, 4, 4)
    rs = np.random.RandomState(5)
    x_T = rs.randn(*shape).astype(np.float32)
    cond_val, uncond_val = 0.3, -0.1

    def toy_torch(x, t, c):
        return 0.5 * torch.tanh(x) + c

    stub = _StubDiffusion(toy_torch)
    sampler = RefDDIM(stub)
    # the reference's register_buffer force-moves to CUDA (ddim.py:18-23);
    # keep buffers on CPU for the oracle run
    sampler.register_buffer = (
        lambda name, attr: setattr(sampler, name,
                                   attr if isinstance(attr, torch.Tensor)
                                   else torch.tensor(np.asarray(attr),
                                                     dtype=torch.float32)))
    sampler.make_schedule(ddim_num_steps=10, ddim_discretize=spacing,
                          ddim_eta=0.0, verbose=False)
    cond = torch.full((1, 1, 1, 1, 1), cond_val)
    uc = torch.full((1, 1, 1, 1, 1), uncond_val)
    with torch.no_grad():
        img_ref, _ = sampler.ddim_sampling(
            cond, shape, x_T=torch.from_numpy(x_T.copy()),
            unconditional_guidance_scale=7.5, unconditional_conditioning=uc,
            verbose=False, guidance_rescale=0.7)
    img_ref = img_ref.numpy()

    sched = make_schedule(DiffusionConfig())
    ddim = make_ddim_schedule(sched, 10, eta=0.0, timestep_spacing=spacing,
                              use_dynamic_rescale=True)

    def toy_jax(x, t_b, c):
        return 0.5 * jnp.tanh(x) + c

    model_fn = make_cfg_model_fn(
        toy_jax, cond=jnp.full((1, 1, 1, 1, 1), cond_val),
        uncond=jnp.full((1, 1, 1, 1, 1), uncond_val), batched_cfg=True)
    out = ddim_sample(model_fn, ddim, jnp.asarray(x_T),
                      jax.random.PRNGKey(0), guidance_scale=7.5,
                      guidance_rescale=0.7, parameterization="v")
    np.testing.assert_allclose(np.asarray(out), img_ref, atol=1e-4, rtol=1e-3)
