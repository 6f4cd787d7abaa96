"""Utility layer (replaces the reference's missing ``common.py_utils``)."""
from . import data_ops, log  # noqa: F401
