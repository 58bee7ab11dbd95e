from .portable import SPARK, DUCK, Dialect  # noqa: F401
