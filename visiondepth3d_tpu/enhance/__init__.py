from .esrgan import RRDBNet, blend_images, convert_rrdbnet
from .pipeline import EnhanceConfig, init_enhance_params, run_merged_pipeline
from .rife import IFNet, interpolate_pairs
