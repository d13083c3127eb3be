from . import numerics, layout  # noqa: F401

__all__ = ["numerics", "layout"]
