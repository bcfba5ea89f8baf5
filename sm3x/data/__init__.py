from sm3x.data.derm7pt import Derm7ptMeta, LABEL_ORD, GROUPED_SCHEMA, FULL_SCHEMA
from sm3x.data.pipeline import PairedImageData, ImageStore, Batch
from sm3x.data.datasets import build_dataset, REGISTRY

__all__ = [
    "Derm7ptMeta",
    "LABEL_ORD",
    "GROUPED_SCHEMA",
    "FULL_SCHEMA",
    "PairedImageData",
    "ImageStore",
    "Batch",
    "build_dataset",
    "REGISTRY",
]
