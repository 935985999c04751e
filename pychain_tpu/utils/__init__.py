from . import oracle, testgraphs

__all__ = ["oracle", "testgraphs"]
