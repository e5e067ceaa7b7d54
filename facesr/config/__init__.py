from facesr.config.config import load_config, set_seed, validate_config

__all__ = ["load_config", "set_seed", "validate_config"]
