"""Flagship beam-decode parity against HF ``generate`` (VERDICT r2 task 1).

The reference decodes its GPT-2 captioner through HF beam search
(reference: src/models/decoders.py:645-654: ``self.model.generate(...,
num_beams, past_key_values=prefix_kv)``). These tests build a tiny random
``GPT2LMHeadModel``, port its weights through :func:`hf_port.port_gpt2`,
condition BOTH sides on the same per-layer prefix ``past_key_values``
(computed by running the prefix embeds through the HF backbone — the
intended design the reference's placeholder acknowledged, SURVEY §2.4), and
assert the decoded captions are token-identical.

Deliberate divergences from HF (both replicated under the default
``hf_compat=True``, see inference/decoding.py:beam_search):

* HF only lets a hypothesis finish when its EOS ranks within the top
  ``num_beams`` of the step's ``2*num_beams`` candidates;
* HF's ``early_stopping=False`` heuristic freezes a batch's finished set
  once the best running beam (normalized at current length) cannot beat
  the worst finished hypothesis.

Comparison note: HF pads finished rows with EOS rather than PAD whenever
``pad_token_id`` is falsy (``output_fill_value = pad_token_id or eos`` in
``_beam_search``), so sequences are compared truncated at the first EOS.

Diverse (grouped) beam search cannot be parity-tested against HF in this
environment: transformers 4.57 moved group beam search out of ``generate``
into a hub-hosted ``custom_generate`` repo
(transformers-community/group-beam-search) that requires network access
(attempted 2026-08-18; zero-egress box). Our grouped path follows the same
Hamming-penalty semantics (penalize group g's logprobs by
``diversity_penalty * count`` of same-step tokens chosen by groups < g)
and is covered by fused-vs-exact token parity at 5k vocab
(tests/test_decoding.py) and the deterministic cross-group diversity test
(tests/test_decoding.py::test_diverse_beam_groups_differ).
"""

import jax
import numpy as np
import pytest
import torch

# whole-file golden-parity heavyweight (9 parameterizations x HF generate
# on torch CPU); the fast gate keeps beam correctness via the brute-force
# oracle + fused-candidate parity in test_decoding.py
pytestmark = pytest.mark.slow

jnp = jax.numpy

from image_captioning_ml_project_tpu.config import DecoderConfig, DecoderType
from image_captioning_ml_project_tpu.inference.decoding import beam_search
from image_captioning_ml_project_tpu.models import hf_port
from image_captioning_ml_project_tpu.models.gpt2 import GPT2Decoder

V, H, NL, NH, P = 101, 64, 2, 4, 3
B, K, L = 4, 5, 12
PAD, BOS, EOS = 0, 1, 2


def _truncate_at_eos(row):
    row = list(row)
    if EOS in row:
        row = row[: row.index(EOS) + 1]
    return tuple(row)


def _build_pair(seed):
    """Tiny random HF GPT-2 + our GPT2Decoder holding the ported weights."""
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(seed)
    hf_cfg = GPT2Config(vocab_size=V, n_positions=64, n_embd=H, n_layer=NL,
                        n_head=NH, resid_pdrop=0.0, embd_pdrop=0.0,
                        attn_pdrop=0.0, bos_token_id=BOS, eos_token_id=EOS,
                        pad_token_id=PAD)
    tm = GPT2LMHeadModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    ported = hf_port.port_gpt2(sd, num_layers=NL)

    dcfg = DecoderConfig(decoder_type=DecoderType.GPT2, hidden_dim=H,
                         num_layers=NL, num_heads=NH, dropout=0.0,
                         max_length=L, prefix_length=P, gpt2_n_positions=64)
    dec = GPT2Decoder(config=dcfg, vocab_size=V, pad_token_id=PAD,
                      bos_token_id=BOS, eos_token_id=EOS)
    rng = np.random.RandomState(seed)
    pooled = jnp.asarray(rng.randn(B, 32).astype(np.float32))
    feats = {"pooled_features": pooled}
    caps = jnp.asarray(rng.randint(3, V, (B, 6)))
    variables = dec.init(jax.random.PRNGKey(seed), feats, caps)
    params = dict(variables["params"])
    params["backbone"] = ported["params"]
    return tm, sd, dec, {"params": params}, feats, pooled


def _ours(dec, variables, feats, length_penalty, min_length):
    state = dec.apply(variables, feats, L, method=dec.init_cache)

    def step_fn(s, t):
        return dec.apply(variables, s, t, method=dec.step)

    res = jax.jit(lambda s: beam_search(
        step_fn, s, B, K, BOS, EOS, PAD, L, length_penalty=length_penalty,
        min_length=min_length, return_all=True))(state)
    return np.asarray(res.tokens), np.asarray(res.scores)


def _hf(tm, sd, dec, variables, pooled, length_penalty, min_length):
    from transformers import DynamicCache

    # the same prefix conditioning as our init_cache: per-layer KV of the
    # prefix embeds run through the backbone. HF adds wpe to inputs_embeds
    # itself, so hand it the pre-position embeds.
    prefix_emb = dec.apply(variables, pooled, method=dec._prefix_embeds)
    raw = (np.asarray(prefix_emb, dtype=np.float32)
           - sd["transformer.wpe.weight"][:P][None])
    with torch.no_grad():
        out = tm(inputs_embeds=torch.tensor(raw), use_cache=True)
        legacy = out.past_key_values.to_legacy_cache()
        # generate() does not expand Cache objects for beams — pre-expand
        cache = DynamicCache.from_legacy_cache(tuple(
            (k.repeat_interleave(K, 0), v.repeat_interleave(K, 0))
            for k, v in legacy))
        # input_ids must span the cached prefix (HF slices to the suffix
        # via cache_position); the P dummy tokens are never embedded
        prompt = torch.cat([torch.zeros(B, P, dtype=torch.long),
                            torch.full((B, 1), BOS, dtype=torch.long)], 1)
        gen = tm.generate(
            input_ids=prompt,
            attention_mask=torch.ones((B, P + 1), dtype=torch.long),
            past_key_values=cache,
            num_beams=K, max_length=P + L, length_penalty=length_penalty,
            min_new_tokens=(min_length - 1) if min_length else None,
            early_stopping=False, do_sample=False, num_return_sequences=K,
            return_dict_in_generate=True, output_scores=True)
    seqs = gen.sequences.numpy()[:, P:]  # strip the dummy prompt
    padded = np.full((B * K, L), PAD, dtype=np.int64)
    padded[:, : seqs.shape[1]] = seqs
    return (padded.reshape(B, K, L),
            gen.sequences_scores.numpy().reshape(B, K))


@pytest.mark.parametrize("seed,length_penalty,min_length", [
    (0, 0.8, 0), (1, 0.8, 0), (2, 0.8, 0), (3, 0.8, 0), (4, 0.8, 0),
    (0, 1.0, 0), (1, 1.0, 0),
    (1, 0.8, 4), (2, 0.8, 4),
])
def test_gpt2_beam_token_identical_to_hf_generate(seed, length_penalty,
                                                  min_length):
    tm, sd, dec, variables, feats, pooled = _build_pair(seed)
    ours_tok, ours_sc = _ours(dec, variables, feats, length_penalty,
                              min_length)
    hf_tok, hf_sc = _hf(tm, sd, dec, variables, pooled, length_penalty,
                        min_length)
    for b in range(B):
        assert _truncate_at_eos(ours_tok[b, 0]) == \
            _truncate_at_eos(hf_tok[b, 0]), (
                f"seed {seed} image {b}: ours {ours_tok[b, 0]} "
                f"(score {ours_sc[b, 0]:.4f}) vs HF {hf_tok[b, 0]} "
                f"(score {hf_sc[b, 0]:.4f})")
        np.testing.assert_allclose(ours_sc[b, 0], hf_sc[b, 0], rtol=1e-4,
                                   atol=1e-5)
