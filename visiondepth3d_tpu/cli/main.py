"""vd3d command-line front-end.

Supersedes the reference's ``render_cli.py`` (which drifted out of sync with
its engine — SURVEY.md §2.1 quirks); every flag here maps onto the canonical
StereoParams / RenderConfig schema so the CLI can never rot independently.

Subcommands:
  render   video + depth video -> 3D video (the 3D tab)
  depth    video -> depth video (the depth tab)         [model zoo]
  preview  single-frame diagnostic renders
  bench    run the standard benchmark configs
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from ..pipeline.stereo_pipeline import RenderConfig, render_stereo_video
from ..stereo import StereoParams
from ..config.presets import load_builtin, load_preset, params_to_dict


def _add_param_flags(p: argparse.ArgumentParser):
    for f in dataclasses.fields(StereoParams):
        if f.name == "warp_hw":
            continue
        default = f.default
        if isinstance(default, bool):
            p.add_argument(
                f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                default=None, metavar="BOOL",
            )
        elif isinstance(default, (int, float)):
            p.add_argument(f"--{f.name}", type=type(default), default=None)
        elif isinstance(default, str):
            p.add_argument(f"--{f.name}", type=str, default=None)


def _build_render_parser(sub):
    p = sub.add_parser("render", help="render a 3D video from video + depth")
    p.add_argument("--input", required=True)
    p.add_argument("--depth", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--format", default="Full-SBS",
                   choices=["Half-SBS", "Full-SBS", "VR", "Red-Cyan Anaglyph",
                            "Passive Interlaced"])
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--aspect", default="Default (16:9)")
    p.add_argument("--preserve-aspect", action="store_true")
    p.add_argument("--codec", default="libx264")
    p.add_argument("--crf", type=int, default=23)
    p.add_argument("--fps", type=float, default=None)
    p.add_argument("--start", type=float, default=None, help="clip start (s)")
    p.add_argument("--end", type=float, default=None, help="clip end (s)")
    p.add_argument("--chunk-size", type=int, default=16)
    p.add_argument("--skip-blank-frames", action="store_true")
    p.add_argument("--auto-crop-black-bars", action="store_true")
    p.add_argument("--preset", default=None,
                   help="builtin preset name or path to a preset JSON")
    p.add_argument("--dry-run", action="store_true")
    _add_param_flags(p)
    return p


def cmd_render(args) -> int:
    if args.preset:
        try:
            params, cfg = load_builtin(args.preset)
        except KeyError:
            params, cfg = load_preset(args.preset)
    else:
        params, cfg = StereoParams(), RenderConfig()

    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(StereoParams)
        if f.name != "warp_hw" and getattr(args, f.name, None) is not None
    }
    if overrides:
        params = params.replace(**overrides)

    cfg = dataclasses.replace(
        cfg,
        output_format=args.format,
        output_height=args.height,
        aspect=args.aspect,
        preserve_original_aspect=args.preserve_aspect,
        codec=args.codec,
        crf=args.crf,
        fps=args.fps,
        start_s=args.start,
        end_s=args.end,
        chunk_size=args.chunk_size,
        skip_blank_frames=args.skip_blank_frames,
        auto_crop_black_bars=args.auto_crop_black_bars,
    )

    output = args.output
    if output is None:
        stem = args.input.rsplit(".", 1)[0]
        tag = args.format.replace(" ", "").replace(":", "")
        output = f"{stem}_{tag}.y4m"

    if args.dry_run:
        print(json.dumps({"params": params_to_dict(params, cfg),
                          "output": output}, indent=2))
        return 0

    def progress(p):
        eta = p.eta_seconds()
        eta_s = f" ETA {eta:.0f}s" if eta else ""
        print(f"\r{p.frames_done} frames | {p.fps:.2f} fps{eta_s}",
              end="", flush=True)

    prog = render_stereo_video(args.input, args.depth, output, params, cfg,
                               progress_cb=progress)
    print(f"\ndone: {prog.frames_done} frames @ {prog.fps:.2f} fps -> {output}")
    return 0


def cmd_depth(args) -> int:
    from ..pipeline.depth_pipeline import render_depth_video

    return render_depth_video(args)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="vd3d",
                                 description="TPU-native 2D->3D video suite")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _build_render_parser(sub)

    dp = sub.add_parser("depth", help="estimate a depth video from a 2D video")
    dp.add_argument("--input", required=True)
    dp.add_argument("--output", default=None)
    dp.add_argument("--model", default="depth-anything-v2-small")
    dp.add_argument("--inference-size", type=int, default=518)
    dp.add_argument("--batch-size", type=int, default=8)
    dp.add_argument("--invert", action="store_true")
    dp.add_argument("--bits", type=int, default=8, choices=[8, 16])

    args = ap.parse_args(argv)
    if args.cmd == "render":
        return cmd_render(args)
    if args.cmd == "depth":
        return cmd_depth(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
