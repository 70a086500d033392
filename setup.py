#!/usr/bin/env python
"""Shim for environments without the ``wheel`` package.

All metadata lives in pyproject.toml (PEP 621). Modern pip uses the
pyproject build backend directly — but PEP 660 editable installs under
setuptools < 70.1 require ``wheel``, which offline/minimal environments
may not have. This file (the reference ships one too:
/root/reference/setup.py) enables the legacy fallback there:

    pip install -e . --no-use-pep517
"""

from setuptools import setup

setup()
