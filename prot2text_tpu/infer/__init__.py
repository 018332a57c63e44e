from .kvcache import init_kv_cache
from .generate import GenerationConfig, generate
