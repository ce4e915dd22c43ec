"""Packaging metadata stays consistent with the code.

The reference ships only a requirements.txt (reference requirements.txt:1-7);
this framework is a proper installable package (pyproject.toml) — these tests
pin the metadata so the wheel keeps matching the source tree.
"""

import pathlib
import tomllib

import cvnerf_tpu

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_pyproject():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_version_matches_package():
    meta = _load_pyproject()
    assert meta["project"]["version"] == cvnerf_tpu.__version__


def test_console_script_targets_exist():
    meta = _load_pyproject()
    import importlib
    for target in meta["project"]["scripts"].values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), target


def test_all_subpackages_included():
    """packages.find must pick up every package directory under cvnerf_tpu
    (a new subpackage with a typo'd __init__ would silently drop from the
    wheel)."""
    meta = _load_pyproject()
    assert meta["tool"]["setuptools"]["packages"]["find"]["include"] == [
        "cvnerf_tpu*"]
    pkg_root = ROOT / "cvnerf_tpu"
    for sub in pkg_root.iterdir():
        if sub.is_dir() and any(sub.glob("*.py")):
            assert (sub / "__init__.py").exists(), (
                f"{sub} has .py files but no __init__.py — it would be "
                "excluded from the wheel")
