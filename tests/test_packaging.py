"""Packaging surface: the reference ships an installable package
(``/root/reference/setup.py:14-30``); ours is pyproject-based. Guard that
the metadata builds and the console entry points resolve."""

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_pyproject_parses_and_matches_package_version():
    cfg = tomllib.loads((REPO / "pyproject.toml").read_text())
    proj = cfg["project"]
    assert proj["name"] == "online_gp_tpu"

    import online_gp_tpu

    assert proj["version"] == online_gp_tpu.__version__
    assert (REPO / "LICENSE").exists()


def test_console_entry_points_resolve():
    cfg = tomllib.loads((REPO / "pyproject.toml").read_text())
    for target in cfg["project"]["scripts"].values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))
