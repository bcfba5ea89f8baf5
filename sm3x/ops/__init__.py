from sm3x.ops.ntxent import (
    ntxent_loss,
    ntxent_logits,
    grouped_ntxent_loss,
)
from sm3x.ops.kmeans import spherical_kmeans
from sm3x.ops.augment import (
    ssl_augment_batch,
    eval_resize_batch,
    supervised_augment_batch,
    normalize_images,
)

__all__ = [
    "ntxent_loss",
    "ntxent_logits",
    "grouped_ntxent_loss",
    "spherical_kmeans",
    "ssl_augment_batch",
    "eval_resize_batch",
    "supervised_augment_batch",
    "normalize_images",
]
