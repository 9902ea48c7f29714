from .observability import (
    FpsMeter,
    RenderControl,
    install_crash_logging,
    profiler_trace,
    stage_timer,
)
from .scene_detect import content_score, detect_scenes, scenes_to_spans
