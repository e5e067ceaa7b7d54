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
