from .profile import ProfileResult, benchmark, time_phases  # noqa: F401
from .csvlog import CsvLogger, CSV_COLUMNS  # noqa: F401

__all__ = ["ProfileResult", "benchmark", "time_phases", "CsvLogger", "CSV_COLUMNS"]
