"""Model zoo: FaceEnhanceNet (+Lite), ESRGAN/RRDBNet, transfer model,
VGG-style discriminator, VGG19 feature extractor."""

from facesr.models.face_enhance_net import (
    FaceEnhanceNet,
    FaceEnhanceNetConfig,
    FaceEnhanceNetLite,
    create_face_enhance_net,
)

__all__ = [
    "FaceEnhanceNet",
    "FaceEnhanceNetConfig",
    "FaceEnhanceNetLite",
    "create_face_enhance_net",
]
