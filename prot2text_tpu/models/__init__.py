from .esm2 import ESM2Config, esm2_encode, init_esm2_params
from .llama import LlamaConfig, llama_forward, llama_logits, init_llama_params
from .qwen3 import Qwen3Config, qwen3_forward, qwen3_logits, init_qwen3_params
