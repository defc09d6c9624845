"""Offline PEP-427 wheel builder for data-cube-spark.

``pip wheel`` with setuptools < 70 needs the third-party ``wheel``
package for its ``bdist_wheel`` command; an air-gapped host without it
cannot build the artifact at all. This builder produces the SAME
``data_cube_spark-<version>-py3-none-any.whl`` (pure-Python, no
extensions, no codegen — nothing setuptools would add beyond metadata)
from stdlib only: ``tomllib`` reads the pyproject, ``zipfile`` writes
the archive, ``hashlib``/``base64`` fill RECORD with the
``sha256=<urlsafe-b64-nopad>`` digests pip verifies on install.

The output installs with plain ``pip install --no-index`` (pip needs no
``wheel`` package to INSTALL a wheel) and carries METADATA,
entry_points.txt (the ``data-cube-spark`` console script), WHEEL and
RECORD per PEP 427 / the core-metadata spec. Timestamps in the archive
are pinned so the build is byte-reproducible for a given tree.

Usage: python tools/build_wheel.py [out_dir]   (default <repo>/dist)
Prints the wheel path on stdout.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: pinned zip timestamp — wheels are consumed by hash, not mtime
_ZIP_DATE = (2026, 1, 1, 0, 0, 0)


def _digest(data: bytes) -> str:
    h = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(h).rstrip(b"=").decode()


def _metadata(proj: dict) -> str:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {proj['version']}",
        f"Summary: {proj['description']}",
    ]
    for a in proj.get("authors", []):
        if "name" in a:
            lines.append(f"Author: {a['name']}")
    lic = proj.get("license")
    if isinstance(lic, dict) and "text" in lic:
        lines.append(f"License: {lic['text']}")
    if proj.get("keywords"):
        lines.append("Keywords: " + ",".join(proj["keywords"]))
    for c in proj.get("classifiers", []):
        lines.append(f"Classifier: {c}")
    if "requires-python" in proj:
        lines.append(f"Requires-Python: {proj['requires-python']}")
    for d in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {d}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for d in deps:
            lines.append(f'Requires-Dist: {d}; extra == "{extra}"')
    body = ""
    readme = proj.get("readme")
    if isinstance(readme, str):
        lines.append("Description-Content-Type: text/markdown")
        with open(os.path.join(REPO, readme), encoding="utf-8") as f:
            body = "\n" + f.read()
    return "\n".join(lines) + "\n" + body


def _entry_points(proj: dict) -> str:
    scripts = proj.get("scripts", {})
    if not scripts:
        return ""
    out = ["[console_scripts]"]
    out += [f"{k} = {v}" for k, v in sorted(scripts.items())]
    return "\n".join(out) + "\n"


def _package_files() -> list[str]:
    """Every .py under the package, repo-relative, sorted — the package
    is pure Python with no data files (mirrors the setuptools
    packages.find include=[data_cube_spark*])."""
    files = []
    for root, dirs, names in os.walk(os.path.join(REPO, "data_cube_spark")):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for n in sorted(names):
            if n.endswith(".py"):
                files.append(os.path.relpath(os.path.join(root, n), REPO))
    return files


def build(out_dir: str) -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    version = proj["version"]
    distname = proj["name"].replace("-", "_")
    tag = "py3-none-any"
    info = f"{distname}-{version}.dist-info"
    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: data-cube-spark-build (tools/build_wheel.py)\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {tag}\n"
    )
    members: list[tuple[str, bytes]] = []
    for rel in _package_files():
        with open(os.path.join(REPO, rel), "rb") as f:
            members.append((rel.replace(os.sep, "/"), f.read()))
    members.append((f"{info}/METADATA", _metadata(proj).encode()))
    members.append((f"{info}/WHEEL", wheel_meta.encode()))
    ep = _entry_points(proj)
    if ep:
        members.append((f"{info}/entry_points.txt", ep.encode()))
    record = "".join(
        f"{name},{_digest(data)},{len(data)}\n" for name, data in members
    ) + f"{info}/RECORD,,\n"
    members.append((f"{info}/RECORD", record.encode()))

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{distname}-{version}-{tag}.whl")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data)
    return path


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    print(build(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
