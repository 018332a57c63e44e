from .attention import dot_product_attention
from .ring_attention import ring_attention
