from .transforms import FieldNormalizer, flip_and_permute, periodic_crop, crop_anchors
from .grf import gaussian_random_field, GRFDataModule
from .registry import DataRegistry
from .camels import CAMELSDataModule, get_dataset

__all__ = [
    "FieldNormalizer",
    "flip_and_permute",
    "periodic_crop",
    "crop_anchors",
    "gaussian_random_field",
    "GRFDataModule",
    "DataRegistry",
    "CAMELSDataModule",
    "get_dataset",
]
