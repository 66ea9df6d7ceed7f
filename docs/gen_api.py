"""Generates the markdown API reference from docstrings.

Counterpart of the reference's Sphinx autodoc site
(``/root/reference/docs/face_crop_plus.*.rst``) without the Sphinx
dependency: introspects the public modules and writes one markdown page per
module into ``docs/api/``, plus an index.  Regenerate after API changes:

    JAX_PLATFORMS=cpu python docs/gen_api.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "face_crop_plus_tpu",
    "face_crop_plus_tpu.cropper",
    "face_crop_plus_tpu.pipeline",
    "face_crop_plus_tpu.convert",
    "face_crop_plus_tpu.models.detection",
    "face_crop_plus_tpu.models.enhancement",
    "face_crop_plus_tpu.models.parsing",
    "face_crop_plus_tpu.models.weights",
    "face_crop_plus_tpu.models.backbones",
    "face_crop_plus_tpu.ops.anchors",
    "face_crop_plus_tpu.ops.nms",
    "face_crop_plus_tpu.ops.nn",
    "face_crop_plus_tpu.ops.transform",
    "face_crop_plus_tpu.ops.warp",
    "face_crop_plus_tpu.ops.yuv",
    "face_crop_plus_tpu.ops.s2d",
    "face_crop_plus_tpu.ops.pallas.nms_kernel",
    "face_crop_plus_tpu.parallel.mesh",
    "face_crop_plus_tpu.parallel.distributed",
    "face_crop_plus_tpu.utils.batching",
    "face_crop_plus_tpu.utils.cache",
    "face_crop_plus_tpu.utils.io",
    "face_crop_plus_tpu.utils.landmarks",
    "face_crop_plus_tpu.utils.names",
    "face_crop_plus_tpu.utils.native_io",
    "face_crop_plus_tpu.utils.profiling",
]

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "api")


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    return inspect.getdoc(obj) or "*(undocumented)*"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _render_function(name: str, fn, heading: str) -> list[str]:
    return [
        f"{heading} `{name}{_signature(fn)}`",
        "",
        _doc(fn),
        "",
    ]


def _render_class(name: str, cls) -> list[str]:
    lines = [f"## class `{name}`", "", _doc(cls), ""]
    init = cls.__dict__.get("__init__")
    if init is not None and callable(init):
        lines += _render_function(f"{name}{_signature(init)}".split("(")[0], init, "###")
        lines[-4] = f"### `{name}.__init__{_signature(init)}`"
    for mname, member in sorted(vars(cls).items()):
        if not _is_public(mname):
            continue
        func = member
        if isinstance(member, (staticmethod, classmethod)):
            func = member.__func__
        elif isinstance(member, property):
            lines += [f"### property `{name}.{mname}`", "", _doc(member), ""]
            continue
        if callable(func) and (inspect.isfunction(func) or hasattr(func, "__wrapped__")):
            target = inspect.unwrap(func)
            lines += _render_function(f"{name}.{mname}{_signature(target)}".split("(")[0], target, "###")
            lines[-4] = f"### `{name}.{mname}{_signature(target)}`"
    return lines


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", "", _doc(mod), ""]

    members = vars(mod)
    funcs, classes, consts = [], [], []
    for name, obj in members.items():
        if not _is_public(name):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # re-exports documented in their home module
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif callable(obj):
            funcs.append((name, inspect.unwrap(obj)))
    for name in getattr(mod, "__all__", []) or []:
        obj = members.get(name)
        if obj is not None and not inspect.isclass(obj) and not callable(obj):
            consts.append((name, obj))

    if consts:
        lines += ["## Constants", ""]
        for name, obj in consts:
            lines += [f"- `{name}` = `{obj!r}`"]
        lines += [""]
    for name, obj in sorted(classes):
        lines += _render_class(name, obj)
    for name, obj in sorted(funcs):
        lines += _render_function(name, obj, "## function")
    return "\n".join(lines).rstrip() + "\n"


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    index = [
        "# API reference",
        "",
        "Generated from docstrings by `docs/gen_api.py` (regenerate with "
        "`JAX_PLATFORMS=cpu python docs/gen_api.py`).",
        "",
    ]
    for modname in MODULES:
        page = modname.replace(".", "_") + ".md"
        with open(os.path.join(OUT_DIR, page), "w") as f:
            f.write(render_module(modname))
        index.append(f"- [`{modname}`]({page})")
    with open(os.path.join(OUT_DIR, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES) + 1} pages to {OUT_DIR}")
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    raise SystemExit(main())
