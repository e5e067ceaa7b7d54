from facesr.config.config import load_config, set_seed

__all__ = ["load_config", "set_seed"]
