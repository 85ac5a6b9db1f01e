"""Composable transform registry (R2/src/data/transforms.py equivalent).

The reference registers torchvision-v2 transforms and composes them from
YAML ``ops:`` lists (plus an albumentations bridge). Here transforms are
numpy/host functions over a sample dict {image (H,W,3) uint8, boxes?,
labels?, landmarks?}, registered by name and composed from the same config
shape:

    transforms = Compose.from_config([
        {"type": "RandomHorizontalFlip", "p": 0.5},
        {"type": "Resize", "size": 640},
        {"type": "Normalize"},
    ])

The SPEED train path uses the fused device augmentation instead
(data/augment.py); this registry serves the detection task and custom
pipelines.
"""
from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

TRANSFORMS: Dict[str, Callable] = {}


def register_transform(fn=None, *, name=None):
    def wrap(f):
        TRANSFORMS[name or f.__name__] = f
        return f

    return wrap(fn) if fn else wrap


class Compose:
    def __init__(self, transforms: List[Callable]):
        self.transforms = transforms

    @classmethod
    def from_config(cls, ops: List[dict], rng=None):
        rng = rng or np.random.RandomState(0)
        built = []
        for op in ops:
            kwargs = dict(op)
            kind = kwargs.pop("type")
            built.append(TRANSFORMS[kind](rng=rng, **kwargs))
        return cls(built)

    def __call__(self, sample: dict) -> dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


@register_transform(name="Resize")
def _resize(size: int, rng=None):
    def apply(sample):
        import cv2

        img = sample["image"]
        H, W = img.shape[:2]
        sample = dict(sample)
        sample["image"] = cv2.resize(img, (size, size),
                                     interpolation=cv2.INTER_LINEAR)
        if "landmarks" in sample:
            lm = np.asarray(sample["landmarks"], np.float64)
            sample["landmarks"] = lm * [size / W, size / H]
        # normalized boxes are resize-invariant
        return sample

    return apply


@register_transform(name="RandomHorizontalFlip")
def _hflip(p: float = 0.5, rng=None):
    def apply(sample):
        if rng.rand() >= p:
            return sample
        sample = dict(sample)
        img = sample["image"]
        W = img.shape[1]
        sample["image"] = img[:, ::-1].copy()
        if "landmarks" in sample:
            lm = np.asarray(sample["landmarks"], np.float64).copy()
            lm[:, 0] = W - 1 - lm[:, 0]
            sample["landmarks"] = lm
        if "boxes" in sample and len(sample["boxes"]):
            b = np.asarray(sample["boxes"], np.float64).copy()  # cxcywh norm
            b[:, 0] = 1.0 - b[:, 0]
            sample["boxes"] = b
        return sample

    return apply


@register_transform(name="Normalize")
def _normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
               rng=None):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    def apply(sample):
        sample = dict(sample)
        sample["image"] = (
            sample["image"].astype(np.float32) / 255.0 - mean
        ) / std
        return sample

    return apply


@register_transform(name="Pad")
def _pad(size: int, rng=None):
    def apply(sample):
        sample = dict(sample)
        img = sample["image"]
        H, W = img.shape[:2]
        out = np.zeros((size, size) + img.shape[2:], img.dtype)
        out[:min(H, size), :min(W, size)] = img[:size, :size]
        sample["image"] = out
        return sample

    return apply


@register_transform(name="RandomZoomOut")
def _zoom_out(p: float = 0.5, max_scale: float = 2.0, rng=None):
    def apply(sample):
        if rng.rand() >= p:
            return sample
        sample = dict(sample)
        img = sample["image"]
        H, W = img.shape[:2]
        scale = rng.uniform(1.0, max_scale)
        nh, nw = int(H * scale), int(W * scale)
        canvas = np.zeros((nh, nw) + img.shape[2:], img.dtype)
        oy, ox = rng.randint(0, nh - H + 1), rng.randint(0, nw - W + 1)
        canvas[oy:oy + H, ox:ox + W] = img
        sample["image"] = canvas
        if "boxes" in sample and len(sample["boxes"]):
            b = np.asarray(sample["boxes"], np.float64).copy()
            b[:, 0] = (b[:, 0] * W + ox) / nw
            b[:, 1] = (b[:, 1] * H + oy) / nh
            b[:, 2] = b[:, 2] * W / nw
            b[:, 3] = b[:, 3] * H / nh
            sample["boxes"] = b
        return sample

    return apply
