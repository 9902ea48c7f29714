"""i18n catalog coverage: every user-facing string resolves in every
language (VERDICT r3 item 5 — the reference ships a 188-key catalog
covering every widget and tooltip, languages/en.json +
VisionDepth3D.py:88-110,2762-2902).

Three surfaces are walked mechanically so new strings cannot ship
untranslated:
  - the CLI parser (every subcommand's help strings, keyed ``help.<en>``),
  - the serve web app (form field names -> ``field.*``, chrome -> ``ui.*``),
  - the stereo-param tooltips (``tooltip.*``).
"""

import argparse
import json
from pathlib import Path

import pytest

LANG_DIR = (Path(__file__).resolve().parents[1]
            / "visiondepth3d_tpu" / "config" / "languages")
LANGS = sorted(p.stem for p in LANG_DIR.glob("*.json"))
PACKS = {lang: json.loads((LANG_DIR / f"{lang}.json").read_text())
         for lang in LANGS}


def _walk_help_strings(parser) -> set[str]:
    out = set()
    if parser.description:
        out.add(parser.description)
    for action in parser._actions:
        if action.help and action.help is not argparse.SUPPRESS:
            out.add(action.help)
        if isinstance(action, argparse._SubParsersAction):
            for pseudo in action._choices_actions:  # subcommand help lines
                if pseudo.help:
                    out.add(pseudo.help)
            for sub in set(action.choices.values()):
                out |= _walk_help_strings(sub)
    return out


def test_languages_present():
    assert set(LANGS) >= {"en", "fr", "de", "es", "ja"}


def test_cli_help_translated_in_every_language():
    """Build the parser under en (th() is identity there) and require a
    ``help.<english text>`` entry in every non-en pack."""
    from visiondepth3d_tpu.config.i18n import set_language
    from visiondepth3d_tpu.cli.main import build_parser

    set_language("en")
    helps = _walk_help_strings(build_parser())
    assert len(helps) > 40  # the surface is real, not a stub parser
    missing = {}
    for lang in LANGS:
        if lang == "en":
            continue
        pack = PACKS[lang]
        miss = sorted(h for h in helps if ("help." + h) not in pack)
        if miss:
            missing[lang] = miss
    assert not missing, json.dumps(missing, indent=2)[:4000]


def test_serve_form_fields_have_labels_everywhere():
    """Every schema-generated serve form field needs ``field.<name>`` in
    every pack, plus the page-chrome ``ui.*`` set."""
    from visiondepth3d_tpu.serve.app import build_meta

    meta = build_meta("en")
    names = set()
    for tab in ("render", "depth", "tools", "scenes"):
        for spec in meta[tab].get("config", []):
            names.add(spec["name"])
    for spec in meta["render"]["params"]:
        names.add(spec["name"])
    # free-form path/extra inputs the page adds outside the schema
    names |= {"input", "output", "depth", "checkpoint", "preset", "model",
              "audio", "mode", "codec", "bitrate", "offset",
              "esrgan_weights", "rife_weights"}
    chrome = {k for k in PACKS["en"] if k.startswith("ui.")}
    assert chrome, "ui.* chrome keys missing from en pack"
    missing = {}
    for lang in LANGS:
        pack = PACKS[lang]
        miss = sorted("field." + n for n in names
                      if ("field." + n) not in pack)
        miss += sorted(k for k in chrome if k not in pack)
        if miss:
            missing[lang] = miss
    assert not missing, json.dumps(missing, indent=2)[:4000]


def test_meta_i18n_section_switches_language():
    from visiondepth3d_tpu.serve.app import build_meta

    en = build_meta("en")
    fr = build_meta("fr")
    assert en["lang"] == "en" and fr["lang"] == "fr"
    assert set(en["languages"]) >= {"en", "fr", "de", "es", "ja"}
    # at least the tab labels actually differ
    assert en["i18n"]["ui.tab.render"] != fr["i18n"]["ui.tab.render"]
    # tooltips ride along for the form titles
    assert any(k.startswith("tooltip.") for k in en["i18n"])


def test_stereo_tooltips_exist_everywhere():
    en_tips = {k for k in PACKS["en"] if k.startswith("tooltip.")}
    assert len(en_tips) >= 30
    for lang in LANGS:
        missing = sorted(en_tips - set(PACKS[lang]))
        assert not missing, (lang, missing)


def test_en_messages_format_cleanly():
    """Every en message with {placeholders} formats without KeyError when
    given its own placeholder names (guards stray braces)."""
    import string

    class _Any:  # accepts any format spec ({fps:.1f} etc.)
        def __format__(self, spec):
            return "x"

    fmt = string.Formatter()
    for key, msg in PACKS["en"].items():
        fields = [f for _, f, _, _ in fmt.parse(msg) if f]
        kwargs = {f.split(".")[0].split("[")[0]: _Any() for f in fields}
        try:
            msg.format(**kwargs)
        except (KeyError, IndexError, ValueError) as e:
            pytest.fail(f"{key}: {e}")
