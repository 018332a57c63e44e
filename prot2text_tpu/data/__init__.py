from .tokenization import ProteinTokenizer, esm2_tokenizer, esmc_tokenizer
