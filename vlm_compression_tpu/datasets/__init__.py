"""Data layer: processors, item datasets, builders, loaders, tokenization.

Counterpart of ``lavis/datasets/`` + ``lavis/processors/`` (SURVEY.md
§2.7), including the modules MISSING from the reference snapshot
(dataset item classes, data_utils, dataloader_utils) rebuilt from their
call-sites.
"""

from vlm_compression_tpu.datasets import builders  # noqa: F401 (registers)
from vlm_compression_tpu.datasets import processors  # noqa: F401 (registers)
from vlm_compression_tpu.datasets.builders import (  # noqa: F401
    BaseDatasetBuilder,
    load_builder,
)
from vlm_compression_tpu.datasets.loaders import (  # noqa: F401
    ConcatDataset,
    DataLoader,
    IterLoader,
    MultiIterLoader,
    PrefetchLoader,
    concat_datasets,
    prepare_sample,
    reorg_datasets_by_split,
)
from vlm_compression_tpu.datasets.processors import load_processor  # noqa: F401
from vlm_compression_tpu.datasets.tokenization import (  # noqa: F401
    SimpleTokenizer,
    batch_encode,
    batch_labels,
    load_tokenizer,
    pack_qa,
)
