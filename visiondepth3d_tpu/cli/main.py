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
from ..config.i18n import set_language, t, th
from ..config.presets import load_builtin, load_preset, params_to_dict


class _I18nParser(argparse.ArgumentParser):
    """ArgumentParser that routes every help string through the message
    catalog (``th``: keyed by the English text, falls back to it). Sub-
    parsers inherit the class via argparse's ``parser_class`` default, so
    all 60+ help strings translate with zero call-site churn."""

    def add_argument(self, *args, **kwargs):  # noqa: D102
        if isinstance(kwargs.get("help"), str):
            kwargs["help"] = th(kwargs["help"])
        return super().add_argument(*args, **kwargs)

    def add_subparsers(self, **kwargs):
        action = super().add_subparsers(**kwargs)
        orig = action.add_parser

        def add_parser(name, **kw):
            if isinstance(kw.get("help"), str):
                kw["help"] = th(kw["help"])
            return orig(name, **kw)

        action.add_parser = add_parser
        return action


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
    p.add_argument("--input", default=None)
    p.add_argument("--batch-videos", default=None,
                   help="directory of videos: batch mode (reference 3D-tab "
                        "paired queue); pairs <name> with <name>_depth in "
                        "--batch-depths")
    p.add_argument("--batch-depths", default=None)
    p.add_argument("--batch-out", default=None)
    p.add_argument("--depth", default=None,
                   help="precomputed depth video; omit to run the fused "
                        "single-pass 2D->3D route with --model")
    p.add_argument("--model", default="depth-anything-v2-small",
                   help="depth model for the fused route (no --depth)")
    p.add_argument("--checkpoint", default=None,
                   help="converted weights for --model (fused route)")
    from ..depth.registry import parse_inference_size

    p.add_argument("--inference-size", type=parse_inference_size,
                   default=None, metavar="N|WxH|NAME",
                   help="square int, WxH rectangle, or a named preset "
                        "(dc-max-quality, 720p, ... — the reference's "
                        "resolution catalog)")
    p.add_argument("--allow-random", action="store_true",
                   help="fused route without --checkpoint (garbage depth; "
                        "shape/compile testing only)")
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
    p.add_argument("--start", default=None,
                   help="clip start: seconds or HH:MM:SS(.ms)")
    p.add_argument("--end", default=None,
                   help="clip end: seconds or HH:MM:SS(.ms); a value <= "
                        "start is treated as a DURATION (reference "
                        "semantics)")
    p.add_argument("--chunk-size", type=int, default=16)
    p.add_argument("--skip-blank-frames", action="store_true")
    p.add_argument("--auto-crop-black-bars", action="store_true")
    p.add_argument("--mesh", default="auto",
                   help="multi-device execution: 'auto' (all devices, "
                        "segment-DP; single-device unchanged on 1 chip), "
                        "'dp=N[,sp=M]' to pin the mesh, 'off' to disable")
    p.add_argument("--mesh-snap-scenes", action="store_true",
                   help="snap DP segment boundaries to scene cuts "
                        "(extra host decode pass)")
    p.add_argument("--preset", default=None,
                   help="builtin preset name or path to a preset JSON")
    p.add_argument("--control", default=None, metavar="FILE",
                   help="cooperative suspend/resume/cancel (the reference's "
                        "in-loop flag poll, render_3d.py:1195-1220): the "
                        "file is polled between chunks — write 'pause' to "
                        "suspend, 'run' (or empty) to resume, 'cancel' to "
                        "stop cleanly")
    p.add_argument("--dry-run", action="store_true")
    _add_param_flags(p)
    return p


def cmd_render(args) -> int:
    if args.input is None and args.batch_videos is None:
        print("render needs --input or --batch-videos")
        return 2
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

    from ..pipeline.geometry import resolve_clip_window

    start_s, end_s = resolve_clip_window(args.start, args.end)
    cfg = dataclasses.replace(
        cfg,
        output_format=args.format,
        output_height=args.height,
        aspect=args.aspect,
        preserve_original_aspect=args.preserve_aspect,
        codec=args.codec,
        crf=args.crf,
        fps=args.fps,
        start_s=start_s,
        end_s=end_s,
        chunk_size=args.chunk_size,
        skip_blank_frames=args.skip_blank_frames,
        auto_crop_black_bars=args.auto_crop_black_bars,
        mesh=args.mesh,
        mesh_snap_scenes=args.mesh_snap_scenes,
    )

    if args.batch_videos:
        # sequential paired-queue batch (VisionDepth3D.py:2439-2470)
        from ..pipeline.batch import pair_videos_with_depth, run_batch

        items = pair_videos_with_depth(
            args.batch_videos, args.batch_depths or args.batch_videos,
            args.batch_out or args.batch_videos)
        if not items:
            print(t("batch.none"))
            return 2
        if args.dry_run:
            print(json.dumps({
                "params": params_to_dict(params, cfg),
                "items": [dataclasses.asdict(i) for i in items]}, indent=2))
            return 0

        def batch_progress(item):
            print(f"{item.status:9s} {item.input_path}", flush=True)

        done = run_batch(items, params, cfg, progress_cb=batch_progress)
        for it in done:
            print(t("batch.item", status=it.status, input=it.input_path,
                    frames=it.frames, seconds=it.seconds)
                  + (f" — {it.error}" if it.error else ""))
        return 0 if all(i.status == "done" for i in done) else 1

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

    predictor = None
    if args.depth is None:
        # fused single-pass 2D->3D (make_chunk_fn predictor route)
        from ..depth.registry import load_predictor

        if args.checkpoint is None and not args.allow_random:
            print(t("render.fused_needs_weights"))
            return 2
        kw = {}
        if args.inference_size:
            kw["inference_size"] = args.inference_size
        predictor = load_predictor(args.model, args.checkpoint, **kw)
        if not hasattr(predictor, "predict_01"):
            print(t("render.fused_family", model=args.model))
            return 2

    cancel_check = None
    if args.control:
        from ..utils.observability import make_control_check

        cancel_check = make_control_check(args.control)

    prog = render_stereo_video(args.input, args.depth, output, params, cfg,
                               progress_cb=progress, predictor=predictor,
                               cancel_check=cancel_check)
    print("\n" + t("render.done", frames=prog.frames_done, fps=prog.fps,
                   output=output))
    return 0


def cmd_models(args) -> int:
    """The reference dropdown's catalog surface (load_supported_models,
    render_depth.py:686-726) with recommended inference sizes."""
    from ..depth.registry import CATALOG, inference_resolutions

    for name, e in CATALOG.items():
        if args.family and e.family != args.family:
            continue
        res = "/".join(str(r) for r in inference_resolutions(name))
        covers = ", ".join(e.reference_names)
        print(f"{name:32s} {e.family:12s} sizes {res:20s} [{covers}]")
    return 0


def cmd_depth(args) -> int:
    from ..pipeline.depth_pipeline import render_depth_video

    return render_depth_video(args)


def cmd_tools(args) -> int:
    from ..enhance import EnhanceConfig, run_merged_pipeline

    cfg = EnhanceConfig(
        use_esrgan=args.esrgan,
        esrgan_scale=args.esrgan_scale or 4,
        pre_downscale=args.pre_downscale,
        keep_original_size=not args.upscaled_size,
        blend_mode=args.blend,
        use_rife=args.rife,
        fps_multiplier=args.multiplier,
        chunk_size=args.chunk_size,
        allow_random_weights=args.allow_random_weights,
        dtype=getattr(args, "dtype", "float32"),
    )
    esrgan_params = rife_params = None
    esrgan_path = args.esrgan_weights
    if getattr(args, "esrgan_model", None):
        from ..enhance import ESRGAN_CATALOG
        import os

        entry = ESRGAN_CATALOG[args.esrgan_model]
        esrgan_path = os.path.join(args.weights_dir or "weights",
                                   entry["file"])
    if esrgan_path:
        from ..enhance import load_esrgan_weights

        esrgan_params, ecfg = load_esrgan_weights(
            esrgan_path, scale=args.esrgan_scale)
        # geometry comes from the checkpoint, not the flags
        cfg = dataclasses.replace(
            cfg, esrgan_nf=ecfg.nf, esrgan_nb=ecfg.nb, esrgan_gc=ecfg.gc,
            esrgan_scale=ecfg.scale, esrgan_n_up=ecfg.n_up,
            esrgan_unshuffle=ecfg.unshuffle)
    if args.rife_weights:
        from ..enhance.rife import load_rife_weights

        rife_params = load_rife_weights(args.rife_weights,
                                        scales=cfg.rife_scales)
    output = args.output or str(args.input).rsplit(".", 1)[0] + "_enhanced.y4m"

    def progress(n, fps):
        print(f"\r{n} frames | {fps:.2f} fps", end="", flush=True)

    from ..pipeline.mesh_render import parse_mesh_spec

    mesh_axes = parse_mesh_spec(getattr(args, "mesh", "off"))
    if mesh_axes and mesh_axes.get("sp", 1) > 1:
        raise SystemExit("vd3d tools supports only the dp mesh axis")
    cancel_check = None
    if getattr(args, "control", None):
        from ..utils.observability import make_control_check

        cancel_check = make_control_check(args.control)
    n = run_merged_pipeline(args.input, output, cfg,
                            esrgan_params=esrgan_params,
                            rife_params=rife_params, progress_cb=progress,
                            mesh_axes=mesh_axes, cancel_check=cancel_check)
    print("\n" + t("tools.done", frames=n, output=output))
    return 0


def cmd_audio(args) -> int:
    from ..io.audio import attach_audio, rip_audio

    def progress(pct):
        print(f"\r{pct:.1f}%", end="", flush=True)

    if args.audio_cmd == "rip":
        rip_audio(args.input, args.output, args.codec, args.bitrate, progress)
    else:
        attach_audio(args.video, args.audio, args.output, args.offset,
                     args.reencode, progress)
    print("\ndone")
    return 0


def cmd_scenes(args) -> int:
    """Scene detection; with --split, export one clip per scene (the
    reference's FrameTools scene split, VisionDepth3D.py:1187-1247 —
    PySceneDetect ContentDetector -> per-scene x264 export)."""
    import os

    from ..io.video import open_video, open_writer
    from ..utils import detect_scenes

    with open_video(args.input) as rd:
        fps = rd.fps
        cuts = detect_scenes(iter(rd), threshold=args.threshold)
    print(f"{len(cuts)} scenes")
    for i, c in enumerate(cuts):
        print(f"scene {i}: frame {c} ({c / fps:.2f}s)")
    if not args.split:
        return 0

    from ..io import ffmpeg as ff

    out_dir = args.output or os.path.splitext(args.input)[0] + "_scenes"
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.input))[0]
    starts = list(cuts) or [0]
    if starts[0] != 0:  # enforce the lead-with-0 invariant here rather
        starts.insert(0, 0)  # than relying on detect_scenes' contract
    # x264 .mp4 per scene like the reference (VisionDepth3D.py:1187-1247)
    # when an encoder exists; uncompressed .y4m otherwise
    codec = getattr(args, "codec", "libx264")
    ext = ".y4m" if (codec == "y4m" or not ff.have_ffmpeg()) else ".mp4"
    n = 0
    with open_video(args.input) as rd:
        wr, idx = None, 0
        while True:
            frame = rd.read()
            if frame is None:
                break
            if n < len(starts) and idx == starts[n]:
                if wr is not None:
                    wr.close()
                path = os.path.join(out_dir, f"{base}-Scene-{n + 1:03d}{ext}")
                wr = open_writer(path, rd.width, rd.height, fps,
                                 codec=codec, crf=getattr(args, "crf", 23))
                n += 1
            wr.write(frame)
            idx += 1
        if wr is not None:
            wr.close()
    print(t("scene.split_done", count=n, output=out_dir))
    return 0


def _convert_depth_stream(src: str, dst: str) -> int:
    """`.vd16` <-> FFV1 gray16le conversion (the FFV1 side matches the
    reference's interoperable 16-bit export, render_depth.py:1704-1714)."""
    from ..io.depth_io import (Depth16Reader, Ffv1Gray16Reader,
                               _is_gray16_video, open_depth16_writer)

    if str(src).endswith(".vd16"):
        rd = Depth16Reader(src)
    elif _is_gray16_video(src):
        rd = Ffv1Gray16Reader(src)
    else:
        print(f"{src}: not a 16-bit depth stream (.vd16 or gray16le video)")
        return 2
    n = 0
    try:
        with open_depth16_writer(dst, rd.width, rd.height, rd.fps) as wr:
            for frame in rd:
                wr.write(frame)
                n += 1
    finally:
        rd.close()
    print(t("convert.depth_done", count=n, output=dst))
    return 0


def cmd_convert(args) -> int:
    """One-time checkpoint conversion (the reference converts implicitly
    at model-load, render_depth.py:728-829; here the converted tree is
    persisted as a [Local] folder so later loads skip the torch pass).
    With --depth-in/--depth-out, converts a 16-bit depth stream between
    the raw .vd16 format and interoperable FFV1 gray16le video instead."""
    if getattr(args, "depth_in", None) or getattr(args, "depth_out", None):
        if not (args.depth_in and args.depth_out):
            print("--depth-in and --depth-out must be given together")
            return 2
        return _convert_depth_stream(args.depth_in, args.depth_out)
    if not (args.model and args.checkpoint and args.output):
        print("checkpoint conversion needs --model, --checkpoint and "
              "--output (or use --depth-in/--depth-out for depth streams)")
        return 2
    from ..depth.registry import load_predictor, save_local_params

    pred = load_predictor(args.model, args.checkpoint,
                          inference_size=args.inference_size)
    params = getattr(pred, "params", None)
    if params is None:
        print(f"{args.model}: family does not expose a single params tree "
              "(diffusion pipelines load from their checkpoint dir "
              "directly — point --checkpoint at the converted dir instead)")
        return 2
    import numpy as np

    host = __import__("jax").tree.map(np.asarray, params)
    save_local_params(args.output, args.model, host)
    print(f"converted {args.checkpoint} -> {args.output} "
          f"(load with --model 'local:{args.output}')")
    return 0


def cmd_bench(args) -> int:
    """Run the BASELINE benchmark configs (benchmarks/RESULTS.md records
    the v5e numbers). Config 2 is bench.py's 1080p headline; 1/3/4/5 are
    the harness configs in benchmarks/run_configs.py."""
    import json
    import runpy
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    if not (root / "bench.py").exists():
        print("bench harnesses not found (source checkout required: "
              "bench.py / benchmarks/ live at the repo root)")
        return 2
    wanted = [int(x) for x in str(args.configs).split(",")]
    for c in wanted:
        if c == 2:
            sys.argv = ["bench.py"]
            runpy.run_path(str(root / "bench.py"), run_name="__main__")
        else:
            sys.path.insert(0, str(root / "benchmarks"))
            import run_configs

            try:
                print(json.dumps(run_configs.CONFIGS[c]()), flush=True)
            except Exception as e:  # same contract as the harness main
                print(json.dumps({"metric": f"cfg{c}",
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
    return 0


def cmd_frames(args) -> int:
    from ..pipeline.image_pipeline import assemble_frames, extract_frames

    if bool(args.extract) == bool(args.assemble):
        print("frames: give exactly one of --extract VIDEO / "
              "--assemble FOLDER")
        return 2
    if args.extract:
        n = extract_frames(args.extract, args.output, fmt=args.format,
                           step=args.step)
        print(f"{n} frames -> {args.output}")
    else:
        n = assemble_frames(args.assemble, args.output, fps=args.fps)
        print(f"{n} frames -> {args.output}")
    return 0


def cmd_preview(args) -> int:
    import numpy as np

    from ..io.depth_io import open_depth_reader
    from ..io.video import open_video
    from ..preview import render_preview, save_preview_set

    if args.serve:
        from ..preview import serve_preview

        def started(port):
            print(f"preview UI at http://localhost:{port} — "
                  "Ctrl-C (or quit:true in the session file) to stop")

        n = serve_preview(args.input, args.depth, args.output_dir,
                          port=args.serve, session_path=args.watch,
                          server_started=started)
        print(f"\n{n} renders -> {args.output_dir}")
        return 0

    if args.watch:
        from ..preview import watch_preview

        print(f"watching {args.watch} — edit any field and save; "
              f'set "quit": true (or Ctrl-C) to stop')
        n = watch_preview(args.input, args.depth, args.watch,
                          args.output_dir)
        print(f"\n{n} renders -> {args.output_dir}")
        return 0

    with open_video(args.input) as rd:
        for _ in range(args.frame + 1):
            frame = rd.read()
    dd = open_depth_reader(args.depth)
    for _ in range(args.frame + 1):
        depth = dd.read()
    dd.close()
    out_dir = save_preview_set(
        frame.astype(np.float32) / 255.0, depth, args.output_dir,
        mode=args.mode,
    )
    print(f"preview saved to {out_dir}")
    return 0


def build_parser() -> _I18nParser:
    """The full vd3d argument parser (separate from main so tests can walk
    every subcommand's help strings for i18n coverage)."""
    ap = _I18nParser(prog="vd3d",
                     description=th("TPU-native 2D->3D video suite"))
    ap.add_argument("--lang", default=None, metavar="LANG",
                    help="message language (en/fr/de/es/ja; also "
                         "VD3D_LANG env)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _build_render_parser(sub)

    from ..depth.registry import parse_inference_size

    dp = sub.add_parser("depth", help="estimate a depth video from a 2D video")
    dp.add_argument("--input", required=True)
    dp.add_argument("--output", default=None)
    dp.add_argument("--control", default=None, metavar="FILE",
                    help="cooperative suspend/resume/cancel control file "
                         "(same contract as vd3d render --control)")
    dp.add_argument("--model", default="depth-anything-v2-small")
    dp.add_argument("--inference-size", type=parse_inference_size,
                    default=518, metavar="N|WxH|NAME",
                    help="square int, WxH rectangle (e.g. 1024x576), a "
                         "named preset (dc-max-quality, "
                         "depth-anything-wide, 720p, 1080p, ...) or "
                         "'original' for source resolution; snapped per "
                         "model family")
    dp.add_argument("--batch-size", type=int, default=8)
    dp.add_argument("--invert", action="store_true")
    dp.add_argument("--bits", type=int, default=8, choices=[8, 16])
    dp.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="inference precision (bfloat16 ~ 20%% faster on TPU)")
    dp.add_argument("--checkpoint", default=None,
                    help="converted .safetensors (feed-forward families) or "
                         "checkpoint directory (diffusion)")
    dp.add_argument("--steps", type=int, default=2,
                    help="diffusion denoise steps")
    dp.add_argument("--window", type=int, default=24,
                    help="DepthCrafter sliding-window size")
    dp.add_argument("--overlap", type=int, default=6)
    dp.add_argument("--target-fps", type=float, default=15.0,
                    help="stride long clips down to this rate (DepthCrafter)")
    dp.add_argument("--track-letterbox", action="store_true",
                    help="detect/crop black bars and reinsert them in the "
                         "output depth")
    dp.add_argument("--allow-random-weights", action="store_true",
                    help="run without a checkpoint (shape/compile testing "
                         "only; diffusion output is noise)")
    dp.add_argument("--tiled", action="store_true",
                    help="Hann-blended tiled inference: resize to "
                         "--inference-size then run overlapping "
                         "--tile-size model tiles (high-res detail)")
    dp.add_argument("--tile-size", type=int, default=518,
                    help="model resolution per tile in tiled mode")
    dp.add_argument("--exact-head", action="store_true",
                    help="DA family: exact transformers head op order "
                    "(upsample the 32-ch tensor before the last convs) "
                    "instead of the default fast head")
    dp.add_argument("--tile-overlap", type=int, default=64,
                    help="tile overlap in working-resolution pixels")
    dp.add_argument("--mesh", default="auto",
                    help="multi-device execution: 'auto' (frame-DP over "
                         "the batch / DepthCrafter window-CP when more "
                         "than one device is visible), 'dp=N' to pin, "
                         "'off' to disable")

    fr = sub.add_parser("frames", help="extract video frames to a folder / "
                                       "assemble a folder back into video")
    fr.add_argument("--extract", metavar="VIDEO", default=None)
    fr.add_argument("--assemble", metavar="FOLDER", default=None)
    fr.add_argument("--output", required=True,
                    help="folder (extract) or video path (assemble)")
    fr.add_argument("--format", default="png",
                    choices=["png", "jpg", "bmp", "webp"])
    fr.add_argument("--step", type=int, default=1,
                    help="keep every Nth frame on extract")
    fr.add_argument("--fps", type=float, default=24.0,
                    help="output frame rate on assemble")

    cv = sub.add_parser("convert", help="convert an upstream checkpoint "
                                        "once into a [Local] model folder, "
                                        "or a 16-bit depth stream between "
                                        ".vd16 and FFV1 gray16le")
    cv.add_argument("--model", default=None,
                    help="catalog entry naming the architecture "
                         "(see vd3d models)")
    cv.add_argument("--checkpoint", default=None,
                    help="upstream weights (.safetensors / RIFE .onnx / "
                         "diffusers dir, whatever the family's loader "
                         "accepts)")
    cv.add_argument("--output", default=None,
                    help="folder to write model.safetensors + vd3d.json")
    cv.add_argument("--inference-size", type=int, default=518)
    cv.add_argument("--depth-in", default=None, metavar="STREAM",
                    help="16-bit depth stream to convert (.vd16 or "
                         "gray16le video)")
    cv.add_argument("--depth-out", default=None, metavar="STREAM",
                    help="converted stream (.vd16, or .mkv for FFV1 "
                         "gray16le — needs ffmpeg)")

    bp = sub.add_parser("bench", help="run the standard benchmark configs "
                                      "on the local accelerator")
    bp.add_argument("--configs", default="2",
                    help="comma list from 1-5 (2 = the 1080p headline)")

    mp = sub.add_parser("models", help="list the depth model catalog")
    mp.add_argument("--family", default=None, help="filter by family")

    tp = sub.add_parser("tools", help="RIFE interpolation + Real-ESRGAN upscale")
    tp.add_argument("--input", required=True)
    tp.add_argument("--output", default=None)
    tp.add_argument("--control", default=None, metavar="FILE",
                    help="cooperative suspend/resume/cancel control file "
                         "(same contract as vd3d render --control)")
    tp.add_argument("--rife", action="store_true")
    tp.add_argument("--multiplier", type=int, default=2, choices=[2, 4, 8])
    tp.add_argument("--esrgan", action="store_true")
    tp.add_argument("--esrgan-scale", type=int, default=None,
                    choices=[2, 4],
                    help="override the inferred output scale (needed only "
                         "for KAIR-style .pth files whose unused upconv2 "
                         "makes x2 look like x4)")
    tp.add_argument("--pre-downscale", type=float, default=1.0)
    tp.add_argument("--blend", default="OFF",
                    choices=["OFF", "LOW", "MEDIUM", "HIGH"])
    tp.add_argument("--chunk-size", type=int, default=4)
    tp.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16: bf16 conv stacks (2x MXU throughput, "
                         "<1 u8 step output delta)")
    tp.add_argument("--esrgan-weights", "--esrgan-checkpoint", default=None,
                    dest="esrgan_weights",
                    help="RRDBNet-family checkpoint: .onnx (the formats "
                         "the reference ships), .safetensors, or torch "
                         ".pth; geometry (nf/nb/gc/scale) is inferred")
    from ..enhance.esrgan import ESRGAN_CATALOG

    tp.add_argument("--esrgan-model", default=None,
                    choices=sorted(ESRGAN_CATALOG),
                    help="named upscaler from the reference's catalog "
                         "(VisionDepth3D.py:1094-1100); resolved under "
                         "--weights-dir")
    tp.add_argument("--weights-dir", default=None,
                    help="directory holding the named catalog artifacts "
                         "(default ./weights)")
    tp.add_argument("--rife-weights", default=None,
                    help="RIFE IFNet checkpoint (.onnx export, .safetensors "
                         "or torch .pth state dict)")
    tp.add_argument("--upscaled-size", action="store_true",
                    help="emit frames at the upscaled size instead of "
                         "resizing back to the source size")
    tp.add_argument("--allow-random-weights", action="store_true",
                    help="run without checkpoints (shape/compile testing "
                         "only; output is garbage)")
    tp.add_argument("--mesh", default="off",
                    help="'auto' to shard each chunk's frames over all "
                         "devices, 'dp=N' to pin the device count, "
                         "'off' (default) single-device")

    au = sub.add_parser("audio", help="rip / attach audio tracks (ffmpeg)")
    asub = au.add_subparsers(dest="audio_cmd", required=True)
    ar = asub.add_parser("rip")
    ar.add_argument("--input", required=True)
    ar.add_argument("--output", required=True)
    ar.add_argument("--codec", default="copy")
    ar.add_argument("--bitrate", default=None)
    aa = asub.add_parser("attach")
    aa.add_argument("--video", required=True)
    aa.add_argument("--audio", required=True)
    aa.add_argument("--output", required=True)
    aa.add_argument("--offset", type=float, default=0.0)
    aa.add_argument("--reencode", action="store_true")

    sc = sub.add_parser("scenes", help="content-based scene detection")
    sc.add_argument("--input", required=True)
    sc.add_argument("--threshold", type=float, default=27.0)
    sc.add_argument("--split", action="store_true",
                    help="export one clip per scene (x264 .mp4 when ffmpeg "
                         "is present, matching the reference's FrameTools "
                         "split; uncompressed .y4m otherwise)")
    sc.add_argument("--codec", default="libx264",
                    help="scene-clip codec for --split (ffmpeg encoders, "
                         "e.g. libx264/libx265; 'y4m' forces uncompressed)")
    sc.add_argument("--crf", type=int, default=23,
                    help="quality for --split encoded clips")
    sc.add_argument("--output", default=None, help="scene-clip directory")

    pv = sub.add_parser("preview", help="single-frame diagnostic render")
    pv.add_argument("--input", required=True)
    pv.add_argument("--depth", required=True)
    pv.add_argument("--frame", type=int, default=0)
    pv.add_argument("--mode", default="sbs")
    pv.add_argument("--output-dir", default="./preview")
    pv.add_argument("--watch", default=None, metavar="SESSION_JSON",
                    help="interactive mode: watch this params file and "
                         "re-render on every save (debounced)")
    pv.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="graphical mode: serve a live web UI (preview "
                         "image + param form, two-way bound to the "
                         "session file) at http://localhost:PORT")

    vc = sub.add_parser(
        "verify-checkpoints",
        help="walk every converter family over a weights dir, smoke-test "
             "whatever artifacts are present, write a pass/fail report "
             "(first-contact readiness for real released checkpoints)")
    vc.add_argument("dir", help="directory of released checkpoints (see "
                                "utils/verify_checkpoints.py for the "
                                "expected filenames per family)")
    vc.add_argument("--report", default=None,
                    help="report JSON path (default DIR/vd3d_verify.json)")

    sv = sub.add_parser("serve", help="full web control surface: the "
                        "reference's tabbed app (render / depth / tools / "
                        "audio / scenes) with a job queue and "
                        "suspend/resume/cancel, at http://HOST:PORT")
    sv.add_argument("--port", type=int, default=8765)
    sv.add_argument("--host", default="127.0.0.1",
                    help="bind address (0.0.0.0 exposes the app to the "
                         "network — it has no authentication)")

    return ap


def main(argv=None) -> int:
    import os

    # language must be live BEFORE parsers are built so --help translates;
    # --lang is pre-scanned from raw argv (it precedes the subcommand)
    raw = sys.argv[1:] if argv is None else list(argv)
    lang = os.environ.get("VD3D_LANG")
    for i, a in enumerate(raw):
        if a == "--lang" and i + 1 < len(raw):
            lang = raw[i + 1]
        elif a.startswith("--lang="):
            lang = a.split("=", 1)[1]
    if lang:
        set_language(lang)

    ap = build_parser()
    args = ap.parse_args(argv)
    if args.cmd == "render":
        return cmd_render(args)
    if args.cmd == "models":
        return cmd_models(args)
    if args.cmd == "depth":
        return cmd_depth(args)
    if args.cmd == "frames":
        return cmd_frames(args)
    if args.cmd == "bench":
        return cmd_bench(args)
    if args.cmd == "convert":
        return cmd_convert(args)
    if args.cmd == "tools":
        return cmd_tools(args)
    if args.cmd == "audio":
        return cmd_audio(args)
    if args.cmd == "scenes":
        return cmd_scenes(args)
    if args.cmd == "preview":
        return cmd_preview(args)
    if args.cmd == "verify-checkpoints":
        from ..utils.verify_checkpoints import verify_checkpoints

        report_path = args.report or os.path.join(args.dir,
                                                  "vd3d_verify.json")
        report = verify_checkpoints(args.dir, report_path)
        print(json.dumps({k: report[k] for k in
                          ("dir", "passed", "failed", "missing")}))
        print(f"report: {report_path}")
        return 0 if report["failed"] == 0 else 1
    if args.cmd == "serve":
        from ..serve import serve as _serve

        _serve(port=args.port, host=args.host)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
