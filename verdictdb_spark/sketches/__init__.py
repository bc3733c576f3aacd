from .hll import HllSketch  # noqa: F401
