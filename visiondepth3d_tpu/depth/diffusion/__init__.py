from .schedulers import DDIMSchedule, EulerSchedule, svd_precondition
from .vae import VAE_TINY, AutoencoderKL, VAEConfig
from .unet2d import UNET2D_TINY, UNet2DCondition, UNet2DConfig
from .unet_st import UNET_ST_TINY, UNetSpatioTemporal, UNetSTConfig
from .clip_vision import CLIP_TINY, CLIPVisionConfig, CLIPVisionEncoder
from .marigold import MarigoldPipeline, tiny_marigold
from .depthcrafter import DepthCrafterPipeline, tiny_depthcrafter
from .loaders import (
    load_depthcrafter,
    load_diffusion_pipeline,
    load_marigold,
)
from .convert_diffusers import (
    convert_clip_vision,
    convert_unet2d,
    convert_unet_st,
    convert_vae,
)
