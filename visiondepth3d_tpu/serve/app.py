"""`vd3d serve` — the full graphical control surface, as a local web app.

The reference's main window is a three-tab Tk app (Depth / 3D / Frame
Tools, VisionDepth3D.py:668-2659) plus an audio Toplevel
(core/audio.py:177-324) and a live preview window. The TPU build is
headless, so the graphical surface is one stdlib HTTP page with the same
tabs: schema-generated forms (the same dataclasses that generate the CLI
flags generate the form fields, so the surface cannot drift), a job
queue with live progress/ETA, and suspend/resume/cancel buttons wired to
the pipelines' cooperative ``cancel_check`` contract — the web analog of
the reference's suspend_flag/cancel_flag Events (render_3d.py:1195-1220).

No dependencies beyond the stdlib; point any browser at
``http://localhost:<port>`` (ssh -L forwards it from a TPU host).
Start with ``vd3d serve [--port N]``.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..config.i18n import available_languages, catalog, current_language, t
from .jobs import Job, JobManager

# ---------------------------------------------------------------------------
# schema: dataclass -> form/coercion spec (the CLI generates its flags from
# the same dataclasses, cli/main.py:_add_param_flags — one source of truth)
# ---------------------------------------------------------------------------

_SKIP_FIELDS = {"warp_hw", "max_shift_px_bound", "rife_scales"}


def _field_spec(f) -> dict | None:
    default = f.default
    if isinstance(default, dataclasses._MISSING_TYPE):
        factory = getattr(f, "default_factory", None)
        if isinstance(factory, dataclasses._MISSING_TYPE) or factory is None:
            return None
        default = factory()
    if isinstance(default, bool):
        kind = "bool"
    elif isinstance(default, int):
        kind = "int"
    elif isinstance(default, float):
        kind = "float"
    elif isinstance(default, str):
        kind = "str"
    elif default is None:
        kind = "str?"  # optional, coerced contextually
    else:
        return None
    return {"name": f.name, "kind": kind, "default": default}


def schema_of(cls) -> list[dict]:
    out = []
    for f in dataclasses.fields(cls):
        if f.name in _SKIP_FIELDS:
            continue
        spec = _field_spec(f)
        if spec is not None:
            out.append(spec)
    return out


def coerce_params(cls, params: dict) -> dict:
    """Filter ``params`` to ``cls`` fields and coerce string form values
    to the field's default type (bools accept '1'/'true'/'yes')."""
    out = {}
    specs = {s["name"]: s for s in schema_of(cls)}
    for k, v in params.items():
        s = specs.get(k)
        if s is None or v is None or v == "":
            continue
        kind = s["kind"]
        if kind == "bool":
            out[k] = v if isinstance(v, bool) else (
                str(v).lower() in ("1", "true", "yes", "on"))
        elif k == "inference_size":
            # square int, "WxH" rectangle, or a named preset — the same
            # spec language as the CLI (registry.parse_inference_size)
            from ..depth.registry import parse_inference_size

            out[k] = parse_inference_size(v)
        elif k in ("start_s", "end_s"):
            # seconds or HH:MM:SS(.ms) timecode, like the reference GUI
            from ..pipeline.geometry import parse_timecode

            out[k] = parse_timecode(v)
        elif kind == "int":
            out[k] = int(v)
        elif kind == "float":
            out[k] = float(v)
        else:
            out[k] = str(v)
    return out


# ---------------------------------------------------------------------------
# job runners (one per tab)
# ---------------------------------------------------------------------------


def _run_render(job: Job) -> str:
    from ..pipeline.stereo_pipeline import (RenderConfig, RenderProgress,
                                            render_stereo_video)
    from ..stereo import StereoParams

    p = job.params
    params = StereoParams()
    if p.get("preset"):
        from ..config.presets import load_builtin, load_preset

        try:
            params, cfg = load_builtin(p["preset"])
        except KeyError:
            params, cfg = load_preset(p["preset"])
    else:
        cfg = RenderConfig()
    overrides = coerce_params(StereoParams, p)
    if overrides:
        params = params.replace(**overrides)
    cfg = dataclasses.replace(cfg, **coerce_params(RenderConfig, p))
    if cfg.start_s is not None or cfg.end_s is not None:
        from ..pipeline.geometry import resolve_clip_window

        start_s, end_s = resolve_clip_window(cfg.start_s, cfg.end_s)
        cfg = dataclasses.replace(cfg, start_s=start_s, end_s=end_s)

    inp = p["input"]
    depth = p.get("depth") or None
    output = p.get("output") or (
        inp.rsplit(".", 1)[0]
        + "_" + cfg.output_format.replace(" ", "").replace(":", "") + ".y4m")

    predictor = None
    if depth is None:
        from ..depth.registry import load_predictor

        if not p.get("checkpoint") and not p.get("allow_random"):
            raise ValueError(t("error.fused_needs_checkpoint"))
        kw = {}
        if p.get("inference_size"):
            # same spec language as the CLI and the depth tab (WxH /
            # named preset / int); RenderConfig has no inference_size
            # field so coerce_params never normalizes it on this route
            from ..depth.registry import parse_inference_size

            size = parse_inference_size(p["inference_size"])
            if size is not None:
                kw["inference_size"] = size
        predictor = load_predictor(
            p.get("model", "depth-anything-v2-small"),
            p.get("checkpoint") or None, **kw)
        if not hasattr(predictor, "predict_01"):
            raise ValueError(t("error.fused_needs_feedforward",
                               model=p.get("model")))

    def progress(pr: RenderProgress):
        job.progress.update(
            frames=pr.frames_done, total=pr.total_frames,
            fps=round(pr.fps, 2), eta_s=pr.eta_seconds())

    render_stereo_video(inp, depth, output, params, cfg,
                        progress_cb=progress, predictor=predictor,
                        cancel_check=job.cancel_check())
    return output


def _run_depth(job: Job) -> str:
    from ..pipeline.depth_pipeline import DepthConfig, render_depth_video_file

    p = job.params
    cfg = DepthConfig(**coerce_params(DepthConfig, p))
    inp = p["input"]
    ext = ".vd16" if cfg.bits == 16 else ".y4m"
    output = p.get("output") or inp.rsplit(".", 1)[0] + "_depth" + ext

    def progress(n, fps):
        job.progress.update(frames=n, fps=round(fps, 2))

    render_depth_video_file(inp, output, cfg, progress_cb=progress,
                            cancel_check=job.cancel_check())
    return output


def _run_tools(job: Job) -> str:
    from ..enhance import EnhanceConfig, run_merged_pipeline

    p = job.params
    cfg = EnhanceConfig(**coerce_params(EnhanceConfig, p))
    inp = p["input"]
    output = p.get("output") or inp.rsplit(".", 1)[0] + "_enhanced.y4m"

    esrgan_params = rife_params = None
    if p.get("esrgan_weights"):
        import dataclasses as _dc

        from ..enhance import load_esrgan_weights

        # scale=None: geometry is inferred from the checkpoint. The form
        # posts every field as a string with the schema default pre-filled
        # ("4"), so an explicit override cannot be told apart from the
        # untouched default — and "4" would hard-fail a valid x2plus
        # checkpoint. Ambiguous KAIR .pth files (unused upconv2) need the
        # CLI's --esrgan-scale.
        esrgan_params, ecfg = load_esrgan_weights(p["esrgan_weights"])
        cfg = _dc.replace(
            cfg, esrgan_nf=ecfg.nf, esrgan_nb=ecfg.nb, esrgan_gc=ecfg.gc,
            esrgan_scale=ecfg.scale, esrgan_n_up=ecfg.n_up,
            esrgan_unshuffle=ecfg.unshuffle)
    if p.get("rife_weights"):
        from ..enhance.rife import load_rife_weights

        rife_params = load_rife_weights(p["rife_weights"],
                                        scales=cfg.rife_scales)

    def progress(n, fps):
        job.progress.update(frames=n, fps=round(fps, 2))

    run_merged_pipeline(inp, output, cfg, esrgan_params=esrgan_params,
                        rife_params=rife_params, progress_cb=progress,
                        cancel_check=job.cancel_check())
    return output


def _run_audio(job: Job) -> str:
    from ..io.audio import attach_audio, rip_audio

    p = job.params

    def progress(pct):
        job.progress.update(percent=round(pct, 1))

    if p.get("mode") == "attach":
        out = p.get("output") or p["input"].rsplit(".", 1)[0] + "_audio.mp4"
        attach_audio(p["input"], p["audio"], out,
                     offset_s=float(p.get("offset", 0.0)),
                     codec=p.get("codec", "copy"),
                     progress_cb=progress)
    else:
        out = p.get("output") or p["input"].rsplit(".", 1)[0] + "_audio.m4a"
        rip_audio(p["input"], out, codec=p.get("codec", "copy"),
                  bitrate=p.get("bitrate") or None, progress_cb=progress)
    return out


def _run_scenes(job: Job) -> str:
    import os

    from ..io.video import open_video, open_writer
    from ..utils.scene_detect import detect_scenes

    p = job.params
    inp = p["input"]
    threshold = float(p.get("threshold", 27.0))
    with open_video(inp) as rd:
        fps = rd.fps
        cuts = detect_scenes(iter(rd), threshold=threshold)
    job.progress["scenes"] = len(cuts)
    if not (p.get("split") in (True, "true", "1", "on", "yes")):
        job.progress["cuts"] = cuts[:500]
        return ""
    from ..io import ffmpeg as ff

    out_dir = p.get("output") or os.path.splitext(inp)[0] + "_scenes"
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(inp))[0]
    starts = list(cuts) or [0]
    if starts[0] != 0:
        starts.insert(0, 0)
    check = job.cancel_check()
    codec = p.get("codec") or "libx264"
    ext = ".y4m" if (codec == "y4m" or not ff.have_ffmpeg()) else ".mp4"
    n = 0
    with open_video(inp) as rd:
        wr, idx = None, 0
        while True:
            frame = rd.read()
            if frame is None:
                break
            if n < len(starts) and idx == starts[n]:
                if wr is not None:
                    wr.close()
                if check():
                    return out_dir
                path = os.path.join(out_dir,
                                    f"{base}-Scene-{n + 1:03d}{ext}")
                wr = open_writer(path, rd.width, rd.height, fps,
                                 codec=codec)
                n += 1
            if wr is None:  # defensive: never drop frames
                wr = open_writer(
                    os.path.join(out_dir, f"{base}-Scene-{n:03d}{ext}"),
                    rd.width, rd.height, fps, codec=codec)
            wr.write(frame)
            idx += 1
        if wr is not None:
            wr.close()
    job.progress["clips"] = n
    return out_dir


RUNNERS = {
    "render": _run_render,
    "depth": _run_depth,
    "tools": _run_tools,
    "audio": _run_audio,
    "scenes": _run_scenes,
}


def build_meta(lang: str | None = None) -> dict:
    """Everything the page needs to render its forms: per-tab field specs
    + the model catalog + preset names + output format list + the message
    catalog for ``lang`` (the Tk GUI's refresh_ui_labels analog,
    VisionDepth3D.py:2762-2902 — every label/tooltip/status resolves
    through the same packs the CLI uses)."""
    from ..config.presets import BUILTIN_PRESETS
    from ..depth.registry import CATALOG
    from ..enhance import EnhanceConfig
    from ..io.audio import AUDIO_CODECS
    from ..pipeline.depth_pipeline import DepthConfig
    from ..pipeline.stereo_pipeline import RenderConfig
    from ..stereo import StereoParams

    return {
        "render": {
            "config": schema_of(RenderConfig),
            "params": schema_of(StereoParams),
            "formats": ["Half-SBS", "Full-SBS", "VR", "Red-Cyan Anaglyph",
                        "Passive Interlaced"],
            "presets": sorted(BUILTIN_PRESETS),
        },
        "depth": {
            "config": schema_of(DepthConfig),
            "models": [
                {"name": n, "family": e.family}
                for n, e in CATALOG.items()
            ],
        },
        "tools": {"config": schema_of(EnhanceConfig)},
        "audio": {"codecs": sorted(AUDIO_CODECS)},
        "scenes": {"config": [
            {"name": "threshold", "kind": "float", "default": 27.0},
            {"name": "split", "kind": "bool", "default": False},
            {"name": "codec", "kind": "str", "default": "libx264"},
        ]},
        "i18n": catalog(lang or current_language(),
                        prefixes=("ui.", "field.", "tooltip.")),
        "lang": lang or current_language(),
        "languages": available_languages(),
    }


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------

_PAGE = """<!DOCTYPE html>
<html><head><title>VisionDepth3D-TPU</title><style>
body { font-family: system-ui, sans-serif; margin: 0; background: #191c20;
       color: #d8dce2; }
#tabs { display: flex; background: #22262c; border-bottom: 1px solid #333; }
#tabs button { background: none; color: #9aa3ad; border: 0; padding: 10px
  16px; font-size: 14px; cursor: pointer; }
#tabs button.active { color: #8fb7ff; border-bottom: 2px solid #8fb7ff; }
.tab { display: none; padding: 16px; max-width: 760px; }
.tab.active { display: block; }
label { display: flex; justify-content: space-between; margin: 3px 0;
        font-size: 12px; align-items: center; max-width: 380px; }
input, select { width: 170px; background: #14161a; color: #d8dce2;
  border: 1px solid #444; border-radius: 3px; padding: 3px 5px; }
input[type=checkbox] { width: auto; }
button.go { margin-top: 10px; background: #2b5fad; color: #fff; border: 0;
  border-radius: 4px; padding: 7px 18px; cursor: pointer; }
h3 { margin: 14px 0 4px; font-size: 13px; color: #8fb7ff; }
details { margin: 6px 0; } summary { font-size: 13px; color: #8fb7ff;
  cursor: pointer; }
table { border-collapse: collapse; width: 100%; font-size: 12px; }
td, th { border-bottom: 1px solid #333; padding: 5px 8px; text-align:
  left; }
.jbtn { background: #333; color: #ccc; border: 0; border-radius: 3px;
  padding: 2px 8px; margin-right: 3px; cursor: pointer; font-size: 11px; }
.st-running { color: #7ec97e; } .st-error { color: #e06c75; }
.st-paused { color: #e5c07b; } .st-done { color: #8fb7ff; }
</style></head><body>
<div id="tabs"></div>
<div id="content"></div>
<script>
const TABS = ["render", "depth", "tools", "audio", "scenes", "jobs"];
let META = null;

function T(key) {  // catalog lookup, key itself as last-resort fallback
  return (META && META.i18n && META.i18n[key]) || key;
}

function el(tag, attrs, ...kids) {
  const e = document.createElement(tag);
  for (const [k, v] of Object.entries(attrs || {}))
    if (k.startsWith("on")) e.addEventListener(k.slice(2), v);
    else e.setAttribute(k, v);
  for (const k of kids) e.append(k);
  return e;
}

function fieldRow(tab, spec) {
  const id = tab + "__" + spec.name;
  let input;
  if (spec.kind === "bool")
    input = el("input", {type: "checkbox", id});
  else
    input = el("input", {id, value: spec.default === null ? "" :
                         String(spec.default)});
  if (spec.kind === "bool" && spec.default) input.checked = true;
  const attrs = {};
  const tip = META.i18n["tooltip." + spec.name];
  if (tip) attrs.title = tip;
  return el("label", attrs, T("field." + spec.name) + " ", input);
}

function collect(tab, specs, extraIds) {
  const out = {};
  for (const s of specs) {
    const n = document.getElementById(tab + "__" + s.name);
    if (!n) continue;
    out[s.name] = s.kind === "bool" ? n.checked : n.value;
  }
  for (const x of extraIds || []) {
    const n = document.getElementById(tab + "__" + x);
    if (n) out[x] = n.type === "checkbox" ? n.checked : n.value;
  }
  return out;
}

async function submit(kind, params) {
  const r = await fetch("/api/jobs", {method: "POST",
    headers: {"Content-Type": "application/json"},
    body: JSON.stringify({kind, params})});
  if (r.ok) showTab("jobs"); else alert(await r.text());
}

function pathRows(tab, names) {
  return names.map(n => el("label", {}, T("field." + n) + " ",
    el("input", {id: tab + "__" + n})));
}

function buildForms() {
  const c = document.getElementById("content");
  c.innerHTML = "";
  // render tab
  const rt = el("div", {class: "tab", id: "tab-render"});
  rt.append(el("h3", {}, T("ui.h.render")), ...pathRows("render",
    ["input", "depth", "output", "checkpoint"]));
  const presetSel = el("select", {id: "render__preset"});
  presetSel.append(el("option", {value: ""}, T("ui.none")));
  for (const p of META.render.presets)
    presetSel.append(el("option", {value: p}, p));
  rt.append(el("label", {}, T("field.preset") + " ", presetSel));
  rt.append(el("h3", {}, T("ui.section.config")));
  for (const s of META.render.config) rt.append(fieldRow("render", s));
  const det = el("details", {}, el("summary", {}, T("ui.section.params")));
  for (const s of META.render.params) det.append(fieldRow("render", s));
  rt.append(det);
  rt.append(el("button", {class: "go", onclick: () => submit("render",
    Object.assign(collect("render", META.render.config, ["input", "depth",
      "output", "checkpoint", "preset"]),
      collect("render", META.render.params)))}, T("ui.btn.render")));
  c.append(rt);
  // depth tab
  const dt = el("div", {class: "tab", id: "tab-depth"});
  dt.append(el("h3", {}, T("ui.h.depth")),
    ...pathRows("depth", ["input", "output"]));
  const msel = el("select", {id: "depth__model"});
  for (const m of META.depth.models)
    msel.append(el("option", {value: m.name}, m.name + " (" + m.family +
      ")"));
  dt.append(el("label", {}, T("field.model") + " ", msel));
  for (const s of META.depth.config)
    if (s.name !== "model") dt.append(fieldRow("depth", s));
  dt.append(el("button", {class: "go", onclick: () => submit("depth",
    collect("depth", META.depth.config, ["input", "output", "model"]))},
    T("ui.btn.depth")));
  c.append(dt);
  // tools tab
  const tt = el("div", {class: "tab", id: "tab-tools"});
  tt.append(el("h3", {}, T("ui.h.tools")),
    ...pathRows("tools", ["input", "output", "esrgan_weights",
                          "rife_weights"]));
  for (const s of META.tools.config) tt.append(fieldRow("tools", s));
  tt.append(el("button", {class: "go", onclick: () => submit("tools",
    collect("tools", META.tools.config, ["input", "output",
      "esrgan_weights", "rife_weights"]))}, T("ui.btn.tools")));
  c.append(tt);
  // audio tab
  const at = el("div", {class: "tab", id: "tab-audio"});
  at.append(el("h3", {}, T("ui.h.audio")),
    ...pathRows("audio", ["input", "audio", "output"]));
  const modeSel = el("select", {id: "audio__mode"},
    el("option", {value: "rip"}, "rip"),
    el("option", {value: "attach"}, "attach"));
  at.append(el("label", {}, T("field.mode") + " ", modeSel));
  const csel = el("select", {id: "audio__codec"});
  csel.append(el("option", {value: "copy"}, "copy"));
  for (const cd of META.audio.codecs)
    csel.append(el("option", {value: cd}, cd));
  at.append(el("label", {}, T("field.codec") + " ", csel));
  at.append(el("label", {}, T("field.bitrate") + " ",
    el("input", {id: "audio__bitrate"})));
  at.append(el("label", {}, T("field.offset") + " ",
    el("input", {id: "audio__offset", value: "0"})));
  at.append(el("button", {class: "go", onclick: () => submit("audio",
    collect("audio", [], ["input", "audio", "output", "mode", "codec",
      "bitrate", "offset"]))}, T("ui.btn.audio")));
  c.append(at);
  // scenes tab
  const st = el("div", {class: "tab", id: "tab-scenes"});
  st.append(el("h3", {}, T("ui.h.scenes")),
    ...pathRows("scenes", ["input", "output"]));
  for (const s of META.scenes.config) st.append(fieldRow("scenes", s));
  st.append(el("button", {class: "go", onclick: () => submit("scenes",
    collect("scenes", META.scenes.config, ["input", "output"]))},
    T("ui.btn.scenes")));
  c.append(st);
  // jobs tab
  c.append(el("div", {class: "tab", id: "tab-jobs"},
    el("table", {id: "jobtable"})));
}

function showTab(name) {
  for (const t of TABS) {
    document.getElementById("tab-" + t).classList.toggle("active",
      t === name);
    document.getElementById("tabbtn-" + t).classList.toggle("active",
      t === name);
  }
}

async function refreshJobs() {
  const r = await fetch("/api/jobs");
  const jobs = await r.json();
  const tbl = document.getElementById("jobtable");
  if (!tbl) return;
  tbl.innerHTML = "";
  tbl.append(el("tr", {}, ...["id", "kind", "status", "progress", "output",
    "control"].map(h => el("th", {}, T("ui.col." + h)))));
  for (const j of jobs.reverse()) {
    const prog = j.progress.frames !== undefined ?
      (j.progress.frames + " " + T("ui.frames") + " @ " +
       (j.progress.fps || 0) + " fps" +
       (j.progress.eta_s ? " " + T("ui.eta") + " " +
        Math.round(j.progress.eta_s) + "s" : "")) :
      JSON.stringify(j.progress);
    const ctl = el("td", {});
    for (const a of ["pause", "resume", "cancel"])
      ctl.append(el("button", {class: "jbtn", onclick: () =>
        fetch("/api/jobs/" + j.id + "/control", {method: "POST",
          headers: {"Content-Type": "application/json"},
          body: JSON.stringify({action: a})})}, T("ui.job." + a)));
    tbl.append(el("tr", {},
      el("td", {}, String(j.id)), el("td", {}, j.kind),
      el("td", {class: "st-" + j.status}, T("ui.status." + j.status)),
      el("td", {}, prog),
      el("td", {}, j.error || j.output || ""), ctl));
  }
}

function buildChrome() {
  const tabs = document.getElementById("tabs");
  tabs.innerHTML = "";
  for (const t of TABS)
    tabs.append(el("button", {id: "tabbtn-" + t,
      onclick: () => showTab(t)}, T("ui.tab." + t)));
  const lsel = el("select", {id: "langsel", title: T("ui.lang"),
    onchange: () => setLang(lsel.value)});
  for (const l of META.languages)
    lsel.append(el("option", {value: l}, l));
  lsel.value = META.lang;
  lsel.style.cssText = "width:auto;margin:6px 8px 6px auto;";
  tabs.append(lsel);
}

async function setLang(lang) {
  localStorage.setItem("vd3d_lang", lang);
  META = await (await fetch("/api/meta?lang=" + lang)).json();
  buildChrome();
  buildForms();
  showTab("render");
}

async function init() {
  const lang = localStorage.getItem("vd3d_lang");
  META = await (await fetch("/api/meta" +
    (lang ? "?lang=" + lang : ""))).json();
  buildChrome();
  buildForms();
  showTab("render");
  setInterval(refreshJobs, 1000);
  refreshJobs();
}
init();
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    manager: JobManager = None  # set by make_server
    meta: dict = None
    _meta_cache: dict = None  # per-language meta, built on demand

    def log_message(self, *a):  # quiet
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Cache-Control", "no-store")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path.split("?")[0] == "/api/meta":
            from urllib.parse import parse_qs, urlsplit

            q = parse_qs(urlsplit(self.path).query)
            lang = (q.get("lang") or [None])[0]
            if lang and lang != self.meta["lang"]:
                if lang not in self.meta["languages"]:
                    return self._json({"error": f"unknown lang {lang!r}"},
                                      400)
                meta = self._meta_cache.get(lang)
                if meta is None:
                    meta = self._meta_cache[lang] = build_meta(lang)
                return self._json(meta)
            self._json(self.meta)
        elif self.path == "/api/jobs":
            self._json(self.manager.snapshot())
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        try:
            body = json.loads(self.rfile.read(n) or b"{}")
        except json.JSONDecodeError:
            return self._json({"error": "bad json"}, 400)
        if self.path == "/api/jobs":
            kind = body.get("kind")
            params = body.get("params") or {}
            if kind not in RUNNERS:
                return self._json(
                    {"error": t("error.unknown_kind", kind=repr(kind))}, 400)
            if not params.get("input"):
                return self._json({"error": t("error.input_required")}, 400)
            job = self.manager.submit(kind, params)
            return self._json(job.snapshot(), 201)
        if self.path.startswith("/api/jobs/") and self.path.endswith(
                "/control"):
            try:
                job_id = int(self.path.split("/")[3])
            except (IndexError, ValueError):
                return self._json({"error": "bad job id"}, 400)
            action = body.get("action", "")
            try:
                ok = self.manager.control(job_id, action)
            except ValueError as e:
                return self._json({"error": str(e)}, 400)
            if not ok:
                return self._json({"error": "no such job"}, 404)
            return self._json({"ok": True})
        self._json({"error": "not found"}, 404)


def make_server(port: int = 0, host: str = "127.0.0.1"):
    """Build (but don't run) the server; returns (httpd, manager).
    port 0 binds an ephemeral port (tests)."""
    manager = JobManager(RUNNERS)
    handler = type("Handler", (_Handler,),
                   {"manager": manager, "meta": build_meta(),
                    "_meta_cache": {}})
    httpd = ThreadingHTTPServer((host, port), handler)
    return httpd, manager


def serve(port: int = 8765, host: str = "127.0.0.1") -> None:
    httpd, manager = make_server(port, host)
    print(f"vd3d serve: http://{host}:{httpd.server_address[1]}  "
          "(tabs: render / depth / tools / audio / scenes / jobs)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        manager.shutdown()
        httpd.server_close()


def run_in_thread(port: int = 0, host: str = "127.0.0.1"):
    """Start the server on a daemon thread (tests, embedding).
    Returns (httpd, manager, port)."""
    httpd, manager = make_server(port, host)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, manager, httpd.server_address[1]
