from .moving_average import moving_average, METHODS  # noqa: F401

__all__ = ["moving_average", "METHODS"]
