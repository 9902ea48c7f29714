from .geometry import ASPECT_RATIOS, RenderGeometry, resolve_geometry
from .stereo_pipeline import (
    RenderConfig,
    RenderProgress,
    make_chunk_fn,
    render_stereo_video,
)
