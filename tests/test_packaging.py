"""VERDICT r9 #1: the engine is an installable package. These tests pin
the pyproject contract — metadata parses, the console entry point
resolves to the CLI, and (when the package has been `pip install -e .`-d,
as in this sandbox) the installed distribution agrees with the source
tree on version and entry point."""

import importlib
import tomllib
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _pyproject() -> dict:
    return tomllib.loads((ROOT / "pyproject.toml").read_text())


def test_pyproject_metadata_parses():
    meta = _pyproject()
    proj = meta["project"]
    assert proj["name"] == "data-cube-spark"
    assert any(d.startswith("pyspark>=4") for d in proj["dependencies"])
    # version single-sourced check: pyproject == package __version__
    pkg = importlib.import_module("data_cube_spark")
    assert proj["version"] == pkg.__version__


def test_console_entry_point_resolves_and_runs(capsys):
    """The [project.scripts] target must import and behave like the CLI:
    `data-cube-spark list` == `python -m data_cube_spark list`."""
    meta = _pyproject()
    target = meta["project"]["scripts"]["data-cube-spark"]
    modname, funcname = target.split(":")
    func = getattr(importlib.import_module(modname), funcname)
    import sys

    argv_backup = sys.argv
    try:
        sys.argv = ["data-cube-spark", "list"]
        assert func() == 0
    finally:
        sys.argv = argv_backup
    out = capsys.readouterr().out
    assert "flagship_revenue_by_region  [oracle]" in out


def test_installed_distribution_if_present():
    """When the sandbox has run `pip install -e . --no-build-isolation`
    (the documented offline install), the installed metadata must match
    the tree. Skips cleanly on a source-only checkout."""
    from importlib import metadata

    try:
        dist = metadata.distribution("data-cube-spark")
    except metadata.PackageNotFoundError:
        pytest.skip("package not installed in this environment")
    assert dist.version == _pyproject()["project"]["version"]
    eps = [e for e in dist.entry_points if e.name == "data-cube-spark"]
    assert eps and eps[0].value == "data_cube_spark.__main__:cli"


def test_wheel_builds_installs_and_serves_cli(tmp_path):
    """VERDICT r10 #7: the distributable artifact itself, not just the
    editable install — build a wheel offline, install it into a CLEAN
    ``--target`` dir (repo root never on sys.path), and run the
    installed console script end-to-end from a neutral cwd.

    Builder dispatch: ``pip wheel --no-build-isolation`` when the
    setuptools bdist_wheel toolchain is present (the ``wheel`` package,
    or setuptools >= 70 which inlines it); otherwise the stdlib-only
    PEP-427 builder (``tools/build_wheel.py``) — the sandbox has no
    network, so a missing toolchain must not mean no artifact. Either
    way the assertions below run against the REAL wheel: pip verifies
    every RECORD sha256 on install, so a malformed archive fails here."""
    import importlib.util
    import os
    import subprocess
    import sys
    import zipfile

    wheel_dir = tmp_path / "dist"
    target = tmp_path / "site"
    has_bdist = importlib.util.find_spec("wheel") is not None
    if not has_bdist:
        import setuptools

        # bdist_wheel was vendored into setuptools in 70.1, not 70.0
        has_bdist = tuple(
            int(x) for x in setuptools.__version__.split(".")[:2]
        ) >= (70, 1)
    if has_bdist:
        r = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", str(ROOT),
             "--no-build-isolation", "--no-deps", "-w", str(wheel_dir)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
    else:
        r = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "build_wheel.py"),
             str(wheel_dir)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
    whls = list(wheel_dir.glob("data_cube_spark-*.whl"))
    assert len(whls) == 1
    # the wheel carries the full package, not a stub
    names = zipfile.ZipFile(whls[0]).namelist()
    assert any(n.endswith("operators/similarity.py") for n in names)
    assert any(n.endswith("registry/catalog.py") for n in names)
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-index", "--target", str(target), str(whls[0])],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    script = target / "bin" / "data-cube-spark"
    assert script.exists()
    env = dict(os.environ, PYTHONPATH=str(target))
    r = subprocess.run([sys.executable, str(script), "list"], env=env,
                       cwd=str(tmp_path), capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "flagship_revenue_by_region  [oracle]" in r.stdout
