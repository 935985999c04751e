"""Test/diagnostic utilities.

``oracle`` (the float64 torch reference implementation) is imported
lazily: torch is a TEST-ONLY dependency (pyproject extra), and eagerly
importing it here would make ``import pychain_tpu`` crash on any
install without it.
"""

from . import testgraphs

__all__ = ["oracle", "testgraphs"]


def __getattr__(name):
    if name == "oracle":
        import importlib
        return importlib.import_module(".oracle", __name__)
    raise AttributeError(name)
