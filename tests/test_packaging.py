"""Packaging smoke tests (VERDICT r3 item 9).

The reference ships environment.yml + compile_op.sh; the framework
equivalent is pyproject.toml (`pip install -e .`) + csrc/Makefile.
"""
import pathlib
import tomllib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_pyproject():
    path = ROOT / "pyproject.toml"
    if not path.exists():
        pytest.skip("pyproject.toml not present (installed-package test run)")
    return tomllib.loads(path.read_text())


def test_pyproject_parses_and_names_package():
    meta = _load_pyproject()
    assert meta["project"]["name"] == "pointunet-tpu"
    # jax>=0.8: shard_map/check_vma used unguarded (pipeline/fused.py)
    assert any(d.startswith("jax>=") for d in meta["project"]["dependencies"])


def test_console_script_targets_resolve():
    import importlib

    meta = _load_pyproject()
    for name, target in meta["project"]["scripts"].items():
        module, func = target.split(":")
        mod = importlib.import_module(module)
        assert callable(getattr(mod, func)), f"{name} -> {target}"
