from .esrgan import RRDBNet, blend_images, convert_rrdbnet
from .pipeline import EnhanceConfig, init_enhance_params, run_merged_pipeline
from .rife import (
    IFNet,
    IFNetConfig,
    convert_rife,
    interpolate_pairs,
    load_rife_weights,
)
