from .tokenization import ProteinTokenizer, esm2_tokenizer, esmc_tokenizer
from .chat import ByteTextTokenizer, SYSTEM_MESSAGE
from .collate import (
    Buckets, DerivedCollator, InstructCollator, LightCollator, pad_stack,
)
from .collate_graph import collate_graphs
from .dataset import Prot2TextInstructDataset, Prot2TextLightDataset
from .dataloaders import (
    Prot2TextDerivedCollater, Prot2TextDerivedDataLoader,
    Prot2TextInstructCollater, Prot2TextInstructDataLoader,
    Prot2TextLightCollater,
)
from .sampler import DataLoader, ShardedSampler
