"""Decoded-sample disk cache: decode each PNG once, then read raw bytes.

Full-resolution PNG inflate dominates the host data path (~80 of the
84 ms/sample on GTA5 — PERFORMANCE.md "Host data path"); PNG has no
reduced-scale decode, so on decode-bound hosts the chip starves (the
reference hides the same cost behind 16 worker processes,
``config.py:74``). This cache stores each sample's post-decode,
post-resize tensors (uint8 HWC image + int32 HW trainId label) as one raw
``.bin`` per sample, FFCV-style: epoch 1 populates it through the normal
decode path, every later epoch (and every later run pointed at the same
directory) reads the raw bytes instead of inflating a PNG — a sequential
read the OS page cache serves at memcpy speed on repeats. Measured on the
dev runner at 1280x720: 1.81 ms/sample warm (552 samples/s/thread) vs the
84 ms full decode — 46x (PERFORMANCE.md "Host data path").

Correctness properties:

- The cache directory is keyed by a fingerprint of the dataset identity
  (class, resize target, label mode, and the full ordered pair list), so
  different datasets/splits/sizes never collide and a changed source tree
  gets a fresh key.
- Writes are atomic (temp file + ``os.replace``): a crash mid-write leaves
  no corrupt entry, and concurrent loader threads writing the same index
  are safe.
- A corrupt/truncated/foreign entry fails validation (magic + shape +
  exact byte length) and falls back to the decode path, which rewrites it.

No eviction: entries are immutable function outputs of the fingerprinted
inputs. Delete the directory to reclaim space (GTA5 at 1280x720 is
6.5 MB/sample ≈ 162 GB for all 24966 frames; Cityscapes-train at
1024x512 ≈ 10 GB).
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
from typing import Tuple

import numpy as np

from .datasets import SegmentationDataset

_MAGIC = b"RTDC1\n"
_HEADER = struct.Struct("<6sII")  # magic, H, W


def _fingerprint(base: SegmentationDataset) -> str:
    h = hashlib.sha1()
    h.update(type(base).__name__.encode())
    h.update(repr(tuple(base.size)).encode())
    h.update(repr(getattr(base, "convert_on_the_fly", None)).encode())
    for img_p, lab_p in base.pairs:
        h.update(img_p.encode())
        h.update(lab_p.encode())
    hh, ww = base.size
    return f"{type(base).__name__.lower()}_{hh}x{ww}_{h.hexdigest()[:16]}"


class DecodedCacheDataset(SegmentationDataset):
    """Wrap any :class:`SegmentationDataset` with a decoded-sample cache.

    Duck-compatible with the base dataset (``pairs``/``size``/``load``);
    built by :func:`~rtda_semanticsegmentation_tpu.data.datasets.build_dataset`
    when ``data.decoded_cache_dir`` is set.
    """

    def __init__(self, base: SegmentationDataset, cache_dir: str):
        self.base = base
        self.pairs = base.pairs
        self.size = tuple(base.size)
        self.native_decode = getattr(base, "native_decode", "auto")
        self.dir = os.path.join(
            os.path.abspath(cache_dir), _fingerprint(base)
        )
        os.makedirs(self.dir, exist_ok=True)
        meta_path = os.path.join(self.dir, "meta.json")
        if not os.path.exists(meta_path):
            tmp = meta_path + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "dataset": type(base).__name__,
                        "size": list(self.size),
                        "num_samples": len(base),
                        "first_pair": list(base.pairs[0]) if base.pairs else [],
                    },
                    f,
                    indent=1,
                )
            os.replace(tmp, meta_path)

    def __len__(self) -> int:
        return len(self.base)

    # -- raw record format ---------------------------------------------------

    def _entry_path(self, index: int) -> str:
        return os.path.join(self.dir, f"{index:07d}.bin")

    def _try_read(self, path: str):
        hh, ww = self.size
        img_bytes = hh * ww * 3
        lab_bytes = hh * ww * 4
        expected = _HEADER.size + img_bytes + lab_bytes
        try:
            with open(path, "rb") as f:
                buf = f.read(expected + 1)
        except OSError:
            return None
        if len(buf) != expected:
            return None
        magic, h, w = _HEADER.unpack_from(buf)
        if magic != _MAGIC or (h, w) != (hh, ww):
            return None
        off = _HEADER.size
        img = (
            np.frombuffer(buf, np.uint8, img_bytes, off)
            .reshape(hh, ww, 3)
            .copy()
        )
        label = (
            np.frombuffer(buf, "<i4", hh * ww, off + img_bytes)
            .reshape(hh, ww)
            .copy()
        )
        return img, label

    def _write(self, path: str, img: np.ndarray, label: np.ndarray) -> None:
        hh, ww = self.size
        tmp = path + f".tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                f.write(_HEADER.pack(_MAGIC, hh, ww))
                f.write(np.ascontiguousarray(img, np.uint8).tobytes())
                f.write(
                    np.ascontiguousarray(label, np.int32)
                    .astype("<i4", copy=False)
                    .tobytes()
                )
            os.replace(tmp, path)
        except OSError:
            # Cache is an accelerator, not a requirement: a full/read-only
            # disk must not kill training.
            try:
                os.remove(tmp)
            except OSError:
                pass

    # -- dataset API ---------------------------------------------------------

    def load(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        path = self._entry_path(index)
        cached = self._try_read(path)
        if cached is not None:
            return cached
        img, label = self.base.load(index)
        self._write(path, img, label)
        return img, label
