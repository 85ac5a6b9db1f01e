"""CIFAR-10 dataset wrapper for the classification sanity task
(R2/src/data/cifar10/__init__.py:7-19 equivalent). Reads the standard
python-version batch files from disk (data_batch_1..5 / test_batch); no
torchvision dependency and no downloading (zero-egress environment)."""
from __future__ import annotations

import os.path as osp
import pickle
from typing import Tuple

import numpy as np

CIFAR10_MEAN = np.asarray([0.4914, 0.4822, 0.4465], np.float32)
CIFAR10_STD = np.asarray([0.2470, 0.2435, 0.2616], np.float32)


class CIFAR10:
    def __init__(self, root: str, train: bool = True):
        files = (
            [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        )
        data, labels = [], []
        for fn in files:
            with open(osp.join(root, fn), "rb") as f:
                batch = pickle.load(f, encoding="bytes")
            data.append(batch[b"data"])
            labels.extend(batch[b"labels"])
        self.images = (
            np.concatenate(data).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )
        self.labels = np.asarray(labels, np.int32)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        img = self.images[idx].astype(np.float32) / 255.0
        img = (img - CIFAR10_MEAN) / CIFAR10_STD
        return img, int(self.labels[idx])

    def batches(self, batch_size: int, rng=None):
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            imgs = np.stack([self[int(i)][0] for i in idx])
            labels = self.labels[idx]
            yield imgs, labels
