from .consistency import consistency_mask  # noqa: F401
