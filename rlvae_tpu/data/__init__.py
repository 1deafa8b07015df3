from rlvae_tpu.data.cyclic import (
    CyclicDataModule,
    CyclicSequenceDataset,
    batch_iterator,
)
from rlvae_tpu.data.synth import generate_cyclic_sequences, write_synthetic_dataset

__all__ = [
    "CyclicSequenceDataset",
    "CyclicDataModule",
    "batch_iterator",
    "generate_cyclic_sequences",
    "write_synthetic_dataset",
]
