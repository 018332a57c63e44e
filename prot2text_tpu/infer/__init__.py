from .kvcache import init_kv_cache
from .generate import GenerationConfig, generate, run_generation
from .beam_search import beam_search
from .serving import ContinuousBatcher
from .speculative import (prompt_lookup_generate, self_speculative_generate,
                          speculative_generate)
