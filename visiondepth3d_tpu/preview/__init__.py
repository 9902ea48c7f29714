from .diagnostics import PREVIEW_MODES, render_preview, save_preview_set
from .watch import watch_preview, write_session_template
from .server import serve_preview
