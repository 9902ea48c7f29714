"""Settings persistence (the reference's settings.json auto save/load,
VisionDepth3D.py:143-160, 3062-3129).

A flat JSON of the canonical parameter names + app state (language, last
paths). Loaded at CLI startup when present; every render saves back. The
schema is exactly params_to_dict's, so presets and settings interconvert.
"""

from __future__ import annotations

import json
from pathlib import Path

from .presets import params_from_dict, params_to_dict

DEFAULT_PATH = Path.home() / ".vd3d" / "settings.json"


def load_settings(path: Path | str = DEFAULT_PATH):
    """Returns (StereoParams, RenderConfig, extras dict) or defaults."""
    path = Path(path)
    if not path.exists():
        from ..pipeline.stereo_pipeline import RenderConfig
        from ..stereo import StereoParams

        return StereoParams(), RenderConfig(), {}
    data = json.loads(path.read_text())
    params, cfg = params_from_dict(data)
    extras = {
        k: v
        for k, v in data.items()
        if k in ("language", "last_input", "last_depth", "last_output")
    }
    return params, cfg, extras


def save_settings(params, cfg=None, extras: dict | None = None,
                  path: Path | str = DEFAULT_PATH) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = params_to_dict(params, cfg)
    if extras:
        data.update(extras)
    path.write_text(json.dumps(data, indent=2))
