from keds_tpu.data.datasets import (  # noqa: F401
    CIRR,
    FashionIQ,
    CsvCOCO,
    ImageList,
    CustomFolder,
    CsvDataset,
    FeaturePairDataset,
)
from keds_tpu.data.loader import DataLoader  # noqa: F401
