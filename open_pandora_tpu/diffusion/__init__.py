from open_pandora_tpu.diffusion.schedule import (
    DiffusionSchedule,
    make_schedule,
    make_ddim_timesteps,
    make_ddim_params,
    timestep_embedding,
)
from open_pandora_tpu.diffusion.ddim import DDIMParams, ddim_sample, rescale_noise_cfg
from open_pandora_tpu.diffusion.losses import q_sample, get_v, diffusion_loss
