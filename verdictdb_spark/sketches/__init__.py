from .hll import HllSketch  # noqa: F401
from .cms import CmsSketch  # noqa: F401
from .kll import KllSketch  # noqa: F401
from .tdigest import TDigestSketch  # noqa: F401
from .bloom import BloomSketch  # noqa: F401
