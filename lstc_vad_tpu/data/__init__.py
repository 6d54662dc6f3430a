from .annotations import (  # noqa: F401
    SHTestRecord,
    TrainRecord,
    parse_sht_test,
    parse_sht_train,
    parse_ubnormal,
    parse_ucf_test,
    parse_ucf_train,
)
from .feature_store import FeatureStore  # noqa: F401
from .sampler import sample_part_indices  # noqa: F401
from .datasets import PairedTrainDataset, TestVideo, load_test_videos  # noqa: F401
from .pipeline import BatchIterator, Prefetcher  # noqa: F401
