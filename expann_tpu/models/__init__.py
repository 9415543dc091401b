from expann_tpu.models.base import Engine
from expann_tpu.models.brute_force import BruteForceEngine
from expann_tpu.models.antitopo import AntitopoEngine, AntitopoConfig

__all__ = ["Engine", "BruteForceEngine", "AntitopoEngine", "AntitopoConfig"]
