"""Data layer tests: pairing rules, decode, LUT preprocessing CLI, loader
shuffling/drop_last, infinite target stream, eval padding — on tiny PNG
fixtures generated into tmp dirs (SURVEY.md section 4's fixture strategy)."""

import os

import numpy as np
import pytest
from PIL import Image

from rtda_semanticsegmentation_tpu.data import (
    CityscapesDataset,
    GTA5Dataset,
    InfiniteLoader,
    Loader,
    SyntheticDataset,
    eval_batches,
)
from rtda_semanticsegmentation_tpu.data.labels import (
    GTA5_CLASS_COLORS,
    IGNORE_INDEX,
)
from rtda_semanticsegmentation_tpu.data.preprocess import preprocess_labels

H0, W0 = 40, 56  # on-disk size (resized by datasets)


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def cityscapes_root(tmp_path):
    root = tmp_path / "cs"
    rng = np.random.RandomState(0)
    for split, cities, n in (("val", ["frankfurt"], 3), ("train", ["aachen"], 5)):
        for city in cities:
            for i in range(n):
                stem = f"{city}_{i:06d}_000019"
                img = rng.randint(0, 256, (H0, W0, 3), np.uint8)
                lab = rng.randint(0, 19, (H0, W0)).astype(np.uint8)
                lab[0, :] = 255
                _png(str(root / "images" / split / city / f"{stem}_leftImg8bit.png"), img)
                _png(str(root / "gtFine" / split / city / f"{stem}_gtFine_labelTrainIds.png"), lab)
    return str(root)


@pytest.fixture()
def gta5_root(tmp_path):
    root = tmp_path / "gta5"
    rng = np.random.RandomState(1)
    for i in range(6):
        img = rng.randint(0, 256, (H0, W0, 3), np.uint8)
        # RGB color-coded label using real class colors + one unknown color
        ids = rng.randint(0, 19, (H0, W0))
        rgb = np.asarray(GTA5_CLASS_COLORS, np.uint8)[ids]
        rgb[0, 0] = (1, 2, 3)  # unknown -> ignore
        _png(str(root / "images" / f"{i:05d}.png"), img)
        _png(str(root / "labels" / f"{i:05d}.png"), rgb)
    return str(root)


def test_cityscapes_pairing_and_load(cityscapes_root):
    ds = CityscapesDataset(cityscapes_root, "val", size=(32, 64))
    assert len(ds) == 3
    img_p, lab_p = ds.pairs[0]
    assert "_leftImg8bit" in img_p and "_gtFine_labelTrainIds" in lab_p
    assert f"{os.sep}gtFine{os.sep}" in lab_p
    img, lab = ds.load(0)
    assert img.shape == (32, 64, 3) and img.dtype == np.uint8
    assert lab.shape == (32, 64) and lab.dtype == np.int32
    assert (lab[(lab != 255)] < 19).all()


def test_cityscapes_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        CityscapesDataset(str(tmp_path), "val", size=(32, 64))


def test_gta5_preprocess_then_load(gta5_root):
    written = preprocess_labels(gta5_root, "labels", "labels_trainids")
    assert written == 6
    # idempotent: second run skips all
    assert preprocess_labels(gta5_root, "labels", "labels_trainids") == 0

    ds = GTA5Dataset(gta5_root, "labels_trainids", False, size=(32, 64))
    assert len(ds) == 6
    img, lab = ds.load(0)
    assert lab.dtype == np.int32
    valid = lab[lab != IGNORE_INDEX]
    assert valid.size and (valid < 19).all()


def test_gta5_on_the_fly_matches_preprocessed(gta5_root):
    preprocess_labels(gta5_root, "labels", "labels_trainids")
    pre = GTA5Dataset(gta5_root, "labels_trainids", False, size=(H0, W0))
    fly = GTA5Dataset(gta5_root, "labels", True, size=(H0, W0))
    for i in range(3):
        _, a = pre.load(i)
        _, b = fly.load(i)
        np.testing.assert_array_equal(a, b)


def test_gta5_skips_missing_labels(gta5_root):
    os.remove(os.path.join(gta5_root, "labels", "00003.png"))
    with pytest.warns(UserWarning):
        ds = GTA5Dataset(gta5_root, "labels", True, size=(32, 64))
    assert len(ds) == 5


def test_loader_shuffle_drop_last_determinism():
    ds = SyntheticDataset(length=10, size=(16, 16))
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7)
    assert len(loader) == 2  # 10 // 4
    epoch1 = [b["image"].copy() for b in loader]
    assert all(b.shape == (4, 16, 16, 3) for b in epoch1)
    # same seed + epoch -> same order
    loader2 = Loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7)
    epoch1b = [b["image"].copy() for b in loader2]
    np.testing.assert_array_equal(epoch1[0], epoch1b[0])
    # next epoch reshuffles
    epoch2 = [b["image"].copy() for b in loader2]
    assert not np.array_equal(epoch1[0], epoch2[0])


def test_infinite_loader_wraps():
    ds = SyntheticDataset(length=6, size=(16, 16))
    inf = InfiniteLoader(Loader(ds, batch_size=4, shuffle=False))
    batches = [next(inf) for _ in range(4)]  # > one epoch (1 batch/epoch)
    assert all(b["image"].shape == (4, 16, 16, 3) for b in batches)


def test_loader_multihost_slicing():
    ds = SyntheticDataset(length=8, size=(16, 16))
    full = next(iter(Loader(ds, 4, shuffle=False, drop_last=True)))
    half0 = next(iter(Loader(ds, 4, shuffle=False, process_index=0, process_count=2)))
    half1 = next(iter(Loader(ds, 4, shuffle=False, process_index=1, process_count=2)))
    np.testing.assert_array_equal(
        np.concatenate([half0["image"], half1["image"]]), full["image"]
    )


def test_eval_batches_pads_tail(cityscapes_root):
    ds = CityscapesDataset(cityscapes_root, "val", size=(32, 64))
    out = list(eval_batches(ds, batch_size=2))
    assert len(out) == 2
    imgs, labs, valid = out[-1]
    assert imgs.shape[0] == 2
    assert valid.tolist() == [True, False]


def test_loader_single_worker_no_deadlock():
    """Regression: batch prefetch used to submit into the decode pool and
    deadlock at num_workers=1."""
    ds = SyntheticDataset(length=8, size=(16, 16))
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=1)
    assert sum(1 for _ in loader) == 2
    assert sum(1 for _ in loader) == 2


def test_loader_set_epoch_resumes_shuffle_stream():
    ds = SyntheticDataset(length=12, size=(16, 16))
    a = Loader(ds, 4, shuffle=True, seed=3)
    [list(a) for _ in range(3)]  # epochs 0,1,2 consumed
    epoch3 = [b["image"].copy() for b in a]
    b_loader = Loader(ds, 4, shuffle=True, seed=3)
    b_loader.set_epoch(3)
    epoch3_resumed = [b["image"].copy() for b in b_loader]
    np.testing.assert_array_equal(epoch3[0], epoch3_resumed[0])


def test_eval_batches_process_slices_concatenate(cityscapes_root):
    """Sharded eval decode: the per-host slices of every batch concatenate
    to exactly the unsliced stream (padding included)."""
    ds = CityscapesDataset(cityscapes_root, "val", size=(32, 64))  # 3 images
    full = list(eval_batches(ds, batch_size=4))
    shard0 = list(eval_batches(ds, batch_size=4, process_index=0, process_count=2))
    shard1 = list(eval_batches(ds, batch_size=4, process_index=1, process_count=2))
    assert len(full) == len(shard0) == len(shard1) == 1
    for (fi, fl, fv), (a_i, a_l, a_v), (b_i, b_l, b_v) in zip(
        full, shard0, shard1
    ):
        np.testing.assert_array_equal(np.concatenate([a_i, b_i]), fi)
        np.testing.assert_array_equal(np.concatenate([a_l, b_l]), fl)
        np.testing.assert_array_equal(np.concatenate([a_v, b_v]), fv)
    # host 1's slice of the tail batch is all padding (3 valid of 4)
    assert shard1[0][2].tolist() == [True, False]


def test_infinite_loader_rejects_empty_stream():
    ds = SyntheticDataset(length=2, size=(16, 16))
    with pytest.raises(ValueError, match="target stream is empty"):
        InfiniteLoader(Loader(ds, batch_size=4, drop_last=True))


def test_loader_rejects_droplast_false_multihost():
    ds = SyntheticDataset(length=8, size=(16, 16))
    with pytest.raises(ValueError, match="drop_last"):
        Loader(ds, 4, drop_last=False, process_index=0, process_count=2)


def test_infinite_loader_set_position_matches_uninterrupted():
    """set_position(k) restores pass index AND mid-pass offset: the stream
    continues exactly where an uninterrupted run would after k batches
    (UDA target-stream resume alignment)."""
    ds = SyntheticDataset(length=12, size=(16, 16))

    def fresh():
        return InfiniteLoader(
            Loader(ds, batch_size=4, shuffle=True, seed=5)
        )

    ref = fresh()
    stream = [next(ref)["image"].copy() for _ in range(8)]  # 3 batches/pass
    for k in (0, 2, 3, 5, 7):
        resumed = fresh()
        resumed.set_position(k)
        for j in range(k, 8):
            np.testing.assert_array_equal(
                next(resumed)["image"], stream[j],
                err_msg=f"diverged at batch {j} after set_position({k})",
            )


def test_prefetch_depth_zero_still_yields_every_batch():
    """prefetch depth <= 0 must clamp to 1, not silently produce an empty
    epoch (a zero-batch run would 'succeed' without training)."""
    from rtda_semanticsegmentation_tpu.data.loader import prefetch_to_device

    ds = SyntheticDataset(length=8, size=(8, 8))
    loader = Loader(ds, batch_size=4, shuffle=False)
    for depth in (0, -1, 1, 3):
        out = list(prefetch_to_device(iter(loader), None, depth))
        assert len(out) == 2, (depth, len(out))


def test_cityscapes_root_containing_images_segment(tmp_path):
    """A dataset root that itself contains an 'images' path segment must
    not have that segment rewritten when deriving label paths."""
    root = tmp_path / "images" / "cs"
    rng = np.random.RandomState(3)
    stem = "city_000000_000019"
    _png(str(root / "images" / "val" / "city" / f"{stem}_leftImg8bit.png"),
         rng.randint(0, 256, (H0, W0, 3), np.uint8))
    _png(str(root / "gtFine" / "val" / "city" / f"{stem}_gtFine_labelTrainIds.png"),
         rng.randint(0, 19, (H0, W0)).astype(np.uint8))
    ds = CityscapesDataset(str(root), "val", size=(32, 64))
    assert len(ds) == 1
    img, lab = ds.load(0)
    assert img.shape == (32, 64, 3) and lab.shape == (32, 64)


def test_cityscapes_warns_and_skips_missing_labels(tmp_path):
    root = tmp_path / "cs2"
    rng = np.random.RandomState(4)
    for i in range(2):
        stem = f"city_{i:06d}_000019"
        _png(str(root / "images" / "val" / "city" / f"{stem}_leftImg8bit.png"),
             rng.randint(0, 256, (H0, W0, 3), np.uint8))
    _png(str(root / "gtFine" / "val" / "city" / "city_000000_000019_gtFine_labelTrainIds.png"),
         rng.randint(0, 19, (H0, W0)).astype(np.uint8))
    with pytest.warns(UserWarning, match="no matching label"):
        ds = CityscapesDataset(str(root), "val", size=(32, 64))
    assert len(ds) == 1


class TestDecodedCache:
    def _cached(self, cityscapes_root, tmp_path, size=(32, 64)):
        from rtda_semanticsegmentation_tpu.data.cache import DecodedCacheDataset

        base = CityscapesDataset(cityscapes_root, "val", size=size)
        return base, DecodedCacheDataset(base, str(tmp_path / "cache"))

    def test_roundtrip_bit_exact_and_populates(self, cityscapes_root, tmp_path):
        base, cached = self._cached(cityscapes_root, tmp_path)
        for i in range(len(base)):
            img_b, lab_b = base.load(i)
            img_c, lab_c = cached.load(i)  # miss: decodes + writes
            np.testing.assert_array_equal(img_c, img_b)
            np.testing.assert_array_equal(lab_c, lab_b)
            assert lab_c.dtype == np.int32
            assert os.path.exists(cached._entry_path(i))
        assert os.path.exists(os.path.join(cached.dir, "meta.json"))

    def test_hit_serves_cache_not_source(self, cityscapes_root, tmp_path):
        base, cached = self._cached(cityscapes_root, tmp_path)
        img0, lab0 = cached.load(0)  # populate
        # Overwrite the source PNG; a cache HIT must still return the
        # originally decoded content.
        img_p, _ = base.pairs[0]
        Image.fromarray(np.zeros((H0, W0, 3), np.uint8)).save(img_p)
        img1, lab1 = cached.load(0)
        np.testing.assert_array_equal(img1, img0)
        np.testing.assert_array_equal(lab1, lab0)
        # A fresh uncached dataset sees the new source (sanity).
        img_fresh, _ = base.load(0)
        assert img_fresh.max() == 0

    def test_concurrent_same_index_writes_stay_valid(
        self, cityscapes_root, tmp_path
    ):
        """Racing loader threads on one uncached index (abandoned-epoch
        prefetch vs next epoch) must never publish or serve a corrupt
        entry — tmp files are unique per thread."""
        from concurrent.futures import ThreadPoolExecutor

        base, cached = self._cached(cityscapes_root, tmp_path)
        ref_img, ref_lab = base.load(0)
        with ThreadPoolExecutor(8) as pool:
            results = list(pool.map(lambda _: cached.load(0), range(32)))
        for img, lab in results:
            np.testing.assert_array_equal(img, ref_img)
            np.testing.assert_array_equal(lab, ref_lab)
        # the published entry itself is valid and no tmp litter remains
        assert cached._try_read(cached._entry_path(0)) is not None
        assert not [f for f in os.listdir(cached.dir) if ".tmp." in f]

    def test_corrupt_entry_falls_back_and_heals(self, cityscapes_root, tmp_path):
        base, cached = self._cached(cityscapes_root, tmp_path)
        img0, lab0 = cached.load(1)
        p = cached._entry_path(1)
        with open(p, "wb") as f:
            f.write(b"garbage")
        img1, lab1 = cached.load(1)  # invalid entry -> decode path
        np.testing.assert_array_equal(img1, img0)
        np.testing.assert_array_equal(lab1, lab0)
        assert os.path.getsize(p) > 64  # rewritten (healed)

    def test_size_and_dataset_key_separation(self, cityscapes_root, tmp_path):
        _, c1 = self._cached(cityscapes_root, tmp_path, size=(32, 64))
        _, c2 = self._cached(cityscapes_root, tmp_path, size=(16, 32))
        assert c1.dir != c2.dir
        a, _ = c1.load(0)
        b, _ = c2.load(0)
        assert a.shape == (32, 64, 3) and b.shape == (16, 32, 3)

    def test_factory_wraps_real_but_not_synthetic(self, cityscapes_root, tmp_path):
        import dataclasses as dc

        from rtda_semanticsegmentation_tpu.config import ExperimentConfig
        from rtda_semanticsegmentation_tpu.data.cache import DecodedCacheDataset
        from rtda_semanticsegmentation_tpu.data.datasets import build_dataset

        cfg = ExperimentConfig()
        dcfg = dc.replace(
            cfg.data,
            cityscapes_path=cityscapes_root,
            decoded_cache_dir=str(tmp_path / "cache"),
        )
        ds = build_dataset("cityscapes", "val", (32, 64), dcfg)
        assert isinstance(ds, DecodedCacheDataset)
        syn = build_dataset("synthetic", "train", (32, 64), dcfg)
        assert not isinstance(syn, DecodedCacheDataset)

    def test_loader_integration(self, cityscapes_root, tmp_path):
        _, cached = self._cached(cityscapes_root, tmp_path)
        batches = list(Loader(cached, batch_size=2, shuffle=False,
                              drop_last=False, num_workers=2, seed=0))
        assert sum(b["image"].shape[0] for b in batches) == len(cached)


def test_decoded_cache_regenerated_source_gets_fresh_key(cityscapes_root, tmp_path):
    """Re-generated source files (new mtime/size) must change the cache
    key — a new run decodes fresh content instead of serving stale bytes."""
    import time as _time

    from rtda_semanticsegmentation_tpu.data.cache import DecodedCacheDataset

    base = CityscapesDataset(cityscapes_root, "val", size=(32, 64))
    c1 = DecodedCacheDataset(base, str(tmp_path / "cache"))
    img_old, _ = c1.load(0)
    img_p, _ = base.pairs[0]
    _time.sleep(0.01)  # ensure a distinct mtime
    Image.fromarray(np.zeros((H0, W0, 3), np.uint8)).save(img_p)
    base2 = CityscapesDataset(cityscapes_root, "val", size=(32, 64))
    c2 = DecodedCacheDataset(base2, str(tmp_path / "cache"))
    assert c2.dir != c1.dir
    img_new, _ = c2.load(0)
    assert img_new.max() == 0 and img_old.max() > 0


def test_cache_prewarm_cli(cityscapes_root, tmp_path, capsys):
    from rtda_semanticsegmentation_tpu.data.cache import main as cache_main

    cache_main([
        "--dataset", "cityscapes", "--split", "val",
        "--cityscapes_path", cityscapes_root,
        "--size", "32", "64",
        "--cache_dir", str(tmp_path / "cache"),
        "--num_workers", "2",
    ])
    out = capsys.readouterr().out
    assert "prewarming 3 samples" in out and "done in" in out
    import glob as _glob

    bins = _glob.glob(str(tmp_path / "cache" / "*" / "*.bin"))
    assert len(bins) == 3
