from tdspa.data.batch_prep import prepare_2d_batch, prepare_3d_batch
from tdspa.data.providers import (
    NpzDirectoryProvider,
    SyntheticTrackProvider,
    load_kubric3d_dataset,
    load_tapvid_dataset,
    load_tapvid3d_dataset,
)
from tdspa.data.prefetch import device_prefetch
