from colormipsearch_tpu.persist.config import Config
from colormipsearch_tpu.persist.daos import (
    CDMatchesDao,
    DaosProvider,
    NeuronMetadataDao,
    PPPMatchesDao,
)
from colormipsearch_tpu.persist.store import open_store

__all__ = [
    "CDMatchesDao",
    "Config",
    "DaosProvider",
    "NeuronMetadataDao",
    "PPPMatchesDao",
    "open_store",
]
