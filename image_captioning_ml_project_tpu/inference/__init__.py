from .decoding import (
    greedy_decode,
    sample_decode,
    beam_search,
    decode,
    BeamResult,
    SampleResult,
)
from .reranking import rerank_candidates, clip_rerank_scores
