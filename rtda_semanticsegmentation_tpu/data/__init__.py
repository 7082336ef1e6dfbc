from .labels import (
    GTA5_CLASS_NAMES,
    GTA5_CLASS_COLORS,
    CITYSCAPES_TRAINID_COLORS,
    CITYSCAPES_ID_TO_NAME,
    NUM_CLASSES,
    IGNORE_INDEX,
    build_color_to_id_lut,
    rgb_label_to_train_ids,
    train_ids_to_rgb,
)
from .cache import DecodedCacheDataset
from .datasets import (
    CityscapesDataset,
    GTA5Dataset,
    SegmentationDataset,
    SyntheticDataset,
    build_dataset,
)
from .loader import (
    InfiniteLoader,
    Loader,
    eval_batches,
    prefetch_to_device,
    zip_source_target,
)
