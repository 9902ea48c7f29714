from .diagnostics import PREVIEW_MODES, render_preview, save_preview_set
