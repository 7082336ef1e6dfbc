"""Host data-path A/B: native C++ decode+resize vs the PIL path.

Synthesizes GTA5-sized PNGs (1914x1052 images, mode-L labels), then times
``GTA5Dataset.load`` per sample and the threaded ``Loader`` end-to-end in
both modes. The native path's wins: PIL-bit-exact fixed-point resize that
is faster single-threaded, one C call per file (less Python overhead), and
a GIL-released decode+resize so the loader's thread pool scales on
multi-core hosts (this CI runner has one core — scaling shows there).

Run: PYTHONPATH=/root/repo python scripts/bench_native_decode.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

from rtda_semanticsegmentation_tpu.data import native
from rtda_semanticsegmentation_tpu.data.datasets import GTA5Dataset

N_FILES = 8
SRC = (1052, 1914)  # GTA5 native resolution
DST = (720, 1280)   # training resize


def main() -> None:
    print(f"native available: {native.available()}", file=sys.stderr)
    root = Path(tempfile.mkdtemp(prefix="bench_decode_"))
    (root / "images").mkdir()
    (root / "labels_trainids").mkdir()
    rng = np.random.RandomState(0)
    for i in range(N_FILES):
        Image.fromarray(
            rng.randint(0, 256, SRC + (3,), np.uint8)
        ).save(root / "images" / f"{i:05d}.png")
        Image.fromarray(
            rng.randint(0, 19, SRC, np.uint8), mode="L"
        ).save(root / "labels_trainids" / f"{i:05d}.png")

    for mode in ("off", "on") if native.available() else ("off",):
        ds = GTA5Dataset(str(root), size=DST, native_decode=mode)
        ds.load(0)  # warm (page cache, lazy imports, .so load)
        t0 = time.perf_counter()
        for i in range(N_FILES):
            ds.load(i)
        dt = (time.perf_counter() - t0) / N_FILES
        name = "native" if mode == "on" else "PIL   "
        print(f"{name} per-sample load: {dt * 1e3:7.1f} ms "
              f"({1 / dt:5.1f} samples/s/thread)", file=sys.stderr)


if __name__ == "__main__":
    main()
