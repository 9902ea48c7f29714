from .blackdetect import detect_blank_frames, frame_is_blank
from .depth_io import (
    Depth16Reader,
    Depth16Writer,
    depth01_to_u16,
    normalize_to_u8,
    open_depth_reader,
    save_depth_npz,
)
from .ffmpeg import have_ffmpeg, have_ffprobe, is_av1_encoded, validate_codec
from .video import open_video, open_writer
from .y4m import Y4MReader, Y4MWriter
from .letterbox import (
    LetterboxTracker,
    crop_by_bars,
    detect_letterbox_multiframe,
    detect_letterbox_single,
    is_near_black_frame,
    is_scene_cut,
    reinsert_bars,
)
