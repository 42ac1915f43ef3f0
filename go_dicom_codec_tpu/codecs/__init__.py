"""Transfer-syntax codec adapters.

Each module registers one or more UIDs with the global registry, mirroring
the reference's per-package init() self-registration (SURVEY.md §2.1).
"""

from __future__ import annotations

import importlib

# Grows as codec families land; each module exposes register().
_CODEC_MODULES = [
    "rle",
    "jpeg_baseline",
    "jpeg_extended",
    "jpeg_lossless",
    "jpegls",
    "j2k_adapters",
    "htj2k",
]

_REGISTERED = False


def register_builtin_codecs() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    for name in _CODEC_MODULES:
        mod = importlib.import_module(f".{name}", __package__)
        mod.register()
    _REGISTERED = True
