from .engine import EngineConfig, StylizerEngine  # noqa: F401
