#!/usr/bin/env python
"""Shim for environments without the ``wheel`` package.

All metadata lives in pyproject.toml (PEP 621). Modern pip uses the
pyproject build backend directly — but under setuptools < 70.1 every
pip editable path (PEP 660 AND --no-use-pep517) requires ``wheel``,
which offline/minimal environments may not have. This file (the
reference ships one too: /root/reference/setup.py) enables the
wheel-free fallback there, verified in a fresh venv:

    python setup.py develop
"""

from setuptools import setup

setup()
