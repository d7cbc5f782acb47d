from . import statistics  # noqa: F401
from .fvd import FeatureStats, FVDCalculator, frechet_distance  # noqa: F401
