from .checkpoint import CKPT_BLOCK, SketchCheckpoint  # noqa: F401
