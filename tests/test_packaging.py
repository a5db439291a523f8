"""Packaging surface: pyproject metadata, console entry points, wheel build.

The reference is used as a checked-out script tree; this framework installs
as a package (`pip install .`) with CLI entry points replacing the
reference's `./test.py <weights> <data> <split>` invocation (README
"Usage"). These tests pin that surface.
"""

import importlib
import os
import subprocess
import sys
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_entry_points_resolve():
    """Every [project.scripts] target imports and is callable."""
    scripts = _project()["project"]["scripts"]
    assert set(scripts) == {
        "mvsnet-tpu-eval", "mvsnet-tpu-train",
        "mvsnet-tpu-export", "mvsnet-tpu-gallery",
    }
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


def test_version_attr_matches_dynamic_config():
    import multi_view_stereonet_tpu as pkg

    cfg = _project()
    attr = cfg["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "multi_view_stereonet_tpu.__version__"
    assert isinstance(pkg.__version__, str) and pkg.__version__


def test_core_dependencies_are_the_toplevel_imports():
    """The declared core deps cover exactly the package's eager imports
    (train/checkpoint extras are imported lazily by design)."""
    deps = _project()["project"]["dependencies"]
    names = {d.split(">=")[0].split("==")[0].strip().lower() for d in deps}
    assert names == {"jax", "numpy", "optax", "pillow", "pyyaml"}


@pytest.mark.slow
def test_wheel_builds_and_ships_native_source(tmp_path):
    """`python -m build --wheel` succeeds offline and the wheel carries the
    C++ loader source (compiled lazily at runtime, native/__init__.py)."""
    import zipfile

    proc = subprocess.run(
        [sys.executable, "-m", "build", "--wheel", "--no-isolation",
         "-o", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    wheels = list(tmp_path.glob("*.whl"))
    assert len(wheels) == 1
    names = zipfile.ZipFile(wheels[0]).namelist()
    assert "multi_view_stereonet_tpu/native/image_loader.cc" in names
    assert not any(n.startswith("tests/") for n in names)
    assert any(n.endswith("entry_points.txt") for n in names)
