"""Data pipeline: SAPIEN-layout loaders + synthetic datagen.

Host-side (numpy/PIL) work only; devices see fixed-shape ray buffers.
"""

from aonerf.data.sapien import SapienDataset  # noqa: F401
from aonerf.data.sapien_multi import SapienMultiDataset  # noqa: F401

dataset_dict = {
    "sapien": SapienDataset,
    "sapien_multi": SapienMultiDataset,
}
