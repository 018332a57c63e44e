from .esm2 import ESM2Config, esm2_encode, init_esm2_params
from .llama import LlamaConfig, llama_forward, llama_logits, init_llama_params
from .qwen3 import Qwen3Config, qwen3_forward, qwen3_logits, init_qwen3_params
from .esmc import ESMCConfig, esmc_encode, init_esmc_params
from .adapters import (
    ModalityAdapterConfig, modality_adapter, init_modality_adapter_params,
    RgcnAdapterConfig, rgcn_adapter, init_rgcn_adapter_params,
)
from .fusion import placeholder_merge, concat_fusion, count_check
from .medusa import MedusaConfig, init_medusa_params, medusa_drafts
from .composed import (
    Esm2LlamaInstructConfig, Esm2LlamaInstructForCausalLM,
    Esm2LlamaConfig, Esm2LlamaForCausalLM,
    Esm2Rgcn2LlamaInstructConfig, Esm2Rgcn2LlamaInstructForCausalLM,
    ESMCQwenConfig, ESMCQwen,
)
