"""KV-cache decode path: cached step == full-prefix recompute, and the cached
beam search returns the same hypotheses as the recompute beam search."""

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode import BeamSearchConfig, beam_search
from tailored_avsr_tpu.models.decoder import TransformerDecoder

V, D = 11, 32


def make_decoder(key):
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    mem = jax.random.normal(key, (2, 7, D))
    mem_mask = jnp.arange(7)[None, :] < jnp.array([7, 5])[:, None]
    ys = jnp.array([[V - 1, 1, 2, 3, 0], [V - 1, 4, 5, 6, 0]])
    params = dec.init(key, mem, mem_mask, ys, jnp.array([5, 5]))
    return dec, params, mem, mem_mask, ys


def test_cached_step_matches_full_recompute():
    key = jax.random.PRNGKey(0)
    dec, params, mem, mem_mask, ys = make_decoder(key)
    mem_kv = dec.apply(params, mem, method="precompute_memory")
    cache = dec.init_cache(2, ys.shape[1])
    for pos in range(1, 5):
        full = dec.apply(params, mem, mem_mask, ys, jnp.asarray(pos), method="score_step")
        cached, cache = dec.apply(
            params, mem_kv, mem_mask, ys, jnp.asarray(pos), cache,
            method="score_step_cached",
        )
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(full), atol=2e-5
        ), pos


def test_cached_beam_search_matches_recompute():
    key = jax.random.PRNGKey(1)
    dec, params, mem, mem_mask, _ = make_decoder(key)
    t = 7
    b, k = 2, 3
    ctc_logp = jax.nn.log_softmax(
        jax.random.normal(jax.random.fold_in(key, 2), (b, t, V)), -1
    )
    enc_lens = jnp.array([7, 5])
    cfg = BeamSearchConfig(beam_size=k, ctc_weight=0.3, penalty=0.1)

    def att_full(ys, pos):
        rep = ys.shape[0] // b
        m = jnp.repeat(mem, rep, axis=0)
        mm = jnp.repeat(mem_mask, rep, axis=0)
        return dec.apply(params, m, mm, ys, pos, method="score_step")

    res_full = beam_search(att_full, ctc_logp, enc_lens, V - 1, V - 1, cfg)

    mem_kv = dec.apply(params, mem, method="precompute_memory")
    mem_kv = jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0), mem_kv)
    mm_rep = jnp.repeat(mem_mask, k, axis=0)
    cache = dec.init_cache(b * k, t)

    def att_cached(ys, pos, cache):
        return dec.apply(
            params, mem_kv, mm_rep, ys, pos, cache, method="score_step_cached"
        )

    res_cached = jax.jit(
        lambda lp, el: beam_search(
            att_cached, lp, el, V - 1, V - 1, cfg, att_state=cache
        )
    )(ctc_logp, enc_lens)
    np.testing.assert_array_equal(
        np.asarray(res_full.tokens), np.asarray(res_cached.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(res_full.scores), np.asarray(res_cached.scores), atol=1e-4
    )
