"""Web control surface (`vd3d serve`): the reference's tabbed Tk app
(VisionDepth3D.py) as a stdlib HTTP page + job queue."""

from .app import make_server, run_in_thread, serve  # noqa: F401
from .jobs import Job, JobManager  # noqa: F401
