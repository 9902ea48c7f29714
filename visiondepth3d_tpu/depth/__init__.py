from .configs import (
    DA_TINY,
    DA_V2_BASE,
    DA_V2_LARGE,
    DA_V2_SMALL,
    DPTConfig,
    ViTConfig,
)
from .model import DepthPredictor, init_random
from .registry import CATALOG, load_predictor
