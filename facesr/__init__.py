"""facesr — a TPU-native (JAX/XLA/Pallas/pjit) face super-resolution framework.

Brand-new implementation with the capabilities of the reference PyTorch
project `tomasz-pres/face-super-resolution` (mounted read-only at
/root/reference): 4x face SR (64->256) on FFHQ with FaceEnhanceNet,
three-stage training curriculum (PSNR -> SSIM -> GAN), transfer-learning
ESRGAN model, and the full evaluation/serving stack — redesigned TPU-first
(NHWC, sharded pjit data parallelism, on-device bicubic LR synthesis inside
the jitted train step, bf16 mixed precision).
"""

__version__ = "0.1.0"

_SUBMODULES = (
    "ops", "models", "losses", "data", "training", "parallel",
    "evaluation", "explainability", "ckpt", "config", "utils", "native",
)


def __getattr__(name):
    """Lazy submodule access: `import facesr; facesr.models...` without
    importing the whole framework (keeps `import facesr` light)."""
    if name in _SUBMODULES:
        import importlib

        module = importlib.import_module(f"facesr.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'facesr' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
