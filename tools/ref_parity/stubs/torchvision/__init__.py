from . import transforms, datasets, models  # noqa: F401

__version__ = "0.0.0+stub"
