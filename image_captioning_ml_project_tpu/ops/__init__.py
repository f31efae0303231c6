from .pallas_attention import fused_sdpa, fused_additive_scores
from .ngram import ngram_hashes, ngram_hashes_np, lookup_sorted
