"""Data pipeline: dataset backends, paired transforms, threaded loader,
offline preparation tooling."""

from facesr.data.dataset import FFHQDataset, ImageCache, get_dataloader
from facesr.data.loader import DataLoader
from facesr.data.transforms import PairedTransform, to_array, to_tensor

__all__ = [
    "FFHQDataset",
    "ImageCache",
    "get_dataloader",
    "DataLoader",
    "PairedTransform",
    "to_array",
    "to_tensor",
]
