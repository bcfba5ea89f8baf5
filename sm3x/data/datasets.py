"""Dataset registry (the reference dispatches datasets by name:
`datasets.__dict__[args.data_name]`, src/utils/misc.py:433)."""

from __future__ import annotations

import os
import numpy as np

from sm3x.data.derm7pt import Derm7ptMeta
from sm3x.data.pipeline import ImageStore, PairedImageData


def SevenPCBaseDataset(data_path: str, mode: str, cache_size: int = 320,
                       workers: int = 8, grouped: bool = True,
                       streaming: bool = False):
    """Paired (derm, clinic, label[8]) split over the grouped schema —
    the pipeline's dataset (reference datasets.py:477-570 + grouped
    tables :439-474). `streaming=True` (--no-cache-images) decodes
    batches just-in-time instead of building the RAM canvas cache
    (sm3x.data.streaming — splits beyond host RAM)."""
    meta = Derm7ptMeta(data_path, grouped=grouped)
    if streaming:
        from sm3x.data.streaming import StreamingPairedData

        return StreamingPairedData.from_meta(meta, mode, cache_size, workers)
    return PairedImageData.from_meta(meta, mode, cache_size, workers)


# SevenPCBaseDataset2 (joint-tensor transform variant, reference
# datasets.py:573-605) shares SevenPCBaseDataset's HOST-side layout (the
# canvases are identical); what differs is the augmentation semantics —
# ONE transform call over the stacked derm+clinic pair, i.e. identical
# random params for both modalities, cropped within the common
# min(h),min(w) region. With on-device augmentation that lives in the
# train step: the trainers detect --data-name SevenPCBaseDataset2 and
# select joint per-pair keys (sm3x.ops.augment.modality_keys /
# modality_valid_hw). SevenPCSwavDataset (multi-crop, datasets.py:608-707)
# likewise shares the canvas layout — the multi-crop views are produced
# on device by sm3x.ops.augment.multicrop_augment_batch, selected by name
# in SSLTrainer.
SevenPCBaseDataset2 = SevenPCBaseDataset
SevenPCSwavDataset = SevenPCBaseDataset


class SingleImageData:
    """Single-modality dataset (ISIC transfer tasks, datasets.py:710-827):
    image + multi-label binary targets from a label CSV."""

    def __init__(self, image_dir: str, label_csv: str, cache_size: int = 320,
                 workers: int = 8, ext: str = ".jpg"):
        import pandas as pd

        df = pd.read_csv(label_csv)
        ids = df.iloc[:, 0].astype(str).tolist()
        self.labels = df.iloc[:, 1:].to_numpy().astype(np.int32)
        paths = [os.path.join(image_dir, i + ext) for i in ids]
        self.store = ImageStore(paths, cache_size, crop_amount=0, workers=workers)
        self.n = len(paths)

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 3407,
                shuffle: bool = True):
        from sm3x.data.pipeline import iter_batch_selections

        idx = np.arange(self.n)
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(idx)
        for sel, mask in iter_batch_selections(idx, batch_size):
            yield (self.store.canvases[sel], self.store.valid_hw[sel],
                   self.labels[sel], sel.astype(np.int32), mask)


def _no_streaming(name: str, streaming: bool):
    if streaming:
        raise NotImplementedError(
            f"--no-cache-images (streaming decode) applies to the paired "
            f"Derm7pt datasets, not {name}")


def ISIC17Dataset(data_path: str, mode: str, cache_size: int = 320,
                  workers: int = 8, streaming: bool = False) -> SingleImageData:
    _no_streaming("ISIC17Dataset", streaming)
    sub = "ISIC-2017_Training_Data" if mode == "train" else "ISIC-2017_Test_v2_Data"
    csv = "train_labels.csv" if mode == "train" else "test_labels.csv"
    return SingleImageData(os.path.join(data_path, sub),
                           os.path.join(data_path, csv), cache_size, workers)


def ISIC18Dataset(data_path: str, mode: str, cache_size: int = 320,
                  workers: int = 8, streaming: bool = False) -> SingleImageData:
    _no_streaming("ISIC18Dataset", streaming)
    sub = ("ISIC2018_Task1-2_Training_Input" if mode == "train"
           else "ISIC2018_Task1-2_Test_Input")
    csv = "train_labels.csv" if mode == "train" else "test_labels.csv"
    return SingleImageData(os.path.join(data_path, sub),
                           os.path.join(data_path, csv), cache_size, workers)


REGISTRY = {
    "SevenPCBaseDataset": SevenPCBaseDataset,
    "SevenPCBaseDataset2": SevenPCBaseDataset2,
    "SevenPCSwavDataset": SevenPCSwavDataset,
    "ISIC17Dataset": ISIC17Dataset,
    "ISIC18Dataset": ISIC18Dataset,
}


def build_dataset(data_name: str, data_path: str, mode: str, **kw):
    if data_name not in REGISTRY:
        raise KeyError(f"unknown dataset {data_name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[data_name](data_path, mode, **kw)
