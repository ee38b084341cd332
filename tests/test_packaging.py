"""Packaging metadata sanity: pyproject.toml parses, names real modules,
and the console entry point resolves to a callable."""

import importlib
import os
import tomllib
import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    with open(os.path.join(REPO, 'pyproject.toml'), 'rb') as f:
        return tomllib.load(f)


def test_pyproject_parses_and_package_exists():
    cfg = _load()
    assert cfg['project']['name'] == 'rcfd-tpu'
    assert os.path.isdir(os.path.join(REPO, 'rcfd_tpu'))
    for mod in cfg['tool']['setuptools']['py-modules']:
        assert os.path.isfile(os.path.join(REPO, mod + '.py')), mod


def test_console_script_resolves():
    cfg = _load()
    for name, target in cfg['project']['scripts'].items():
        mod, func = target.split(':')
        m = importlib.import_module(mod)
        assert callable(getattr(m, func)), target
