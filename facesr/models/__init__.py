"""Model zoo: FaceEnhanceNet (+Lite), ESRGAN/RRDBNet, transfer model,
VGG-style discriminator, VGG19 feature extractor."""

from facesr.models.face_enhance_net import (
    FaceEnhanceNet,
    FaceEnhanceNetConfig,
    FaceEnhanceNetLite,
    create_face_enhance_net,
)
from facesr.models.esrgan import (
    RRDBNet,
    RRDBNetConfig,
    ESRGANBaseline,
    create_esrgan_baseline,
    resolve_pretrained_weights,
)
from facesr.models.transfer import (
    TransferSRModel,
    TransferModelConfig,
    TrainingStage,
    create_transfer_model,
)
from facesr.models.discriminator import (
    DiscriminatorConfig,
    create_discriminator,
)

__all__ = [
    "FaceEnhanceNet",
    "FaceEnhanceNetConfig",
    "FaceEnhanceNetLite",
    "create_face_enhance_net",
    "RRDBNet",
    "RRDBNetConfig",
    "ESRGANBaseline",
    "create_esrgan_baseline",
    "resolve_pretrained_weights",
    "TransferSRModel",
    "TransferModelConfig",
    "TrainingStage",
    "create_transfer_model",
    "DiscriminatorConfig",
    "create_discriminator",
]
