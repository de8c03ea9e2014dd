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


def test_decoder_append_step_matches_cached():
    """score_step_append + insert_permute_rows == score_step_cached + eager
    reorder, across steps with beam reordering (the TPU decode fast path:
    the scorer never writes the cache; the new K/V column is folded into the
    beam-reorder gather)."""
    from tailored_avsr_tpu.decode.beam_search import (
        insert_permute_rows,
        reorder_beam_rows,
    )

    key = jax.random.PRNGKey(3)
    b, k = 2, 3
    n = b * k
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    mem = jax.random.normal(key, (n, 7, D))
    mem_mask = jnp.ones((n, 7), bool)
    L = 6
    ys = jnp.zeros((n, L), jnp.int32).at[:, 0].set(V - 1)
    params = dec.init(key, mem, mem_mask, ys, jnp.full((n,), 1))
    mem_kv = dec.apply(params, mem, method="precompute_memory")
    c_ref = dec.init_cache(n, L)
    c_app = dec.init_cache(n, L)
    rng = np.random.RandomState(7)
    for pos in range(1, L):
        lp_r, c_ref = dec.apply(params, mem_kv, mem_mask, ys, jnp.asarray(pos),
                                c_ref, method="score_step_cached")
        lp_a, new_kv = dec.apply(params, mem_kv, mem_mask, ys,
                                 jnp.asarray(pos), c_app,
                                 method="score_step_append")
        np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_r),
                                   rtol=2e-4, atol=2e-5)
        src = jnp.asarray(rng.randint(0, k, (b, k)))
        g = (jnp.arange(b)[:, None] * k + src).reshape(n)
        ys = ys.at[:, pos].set(
            jnp.asarray(rng.randint(1, V - 1, size=(n,)))
        )[g]
        c_ref = jax.tree_util.tree_map(lambda x: reorder_beam_rows(x, src),
                                       c_ref)
        c_app = [
            (insert_permute_rows(ck, kn, src, jnp.asarray(pos)),
             insert_permute_rows(cv, vn, src, jnp.asarray(pos)))
            for (ck, cv), (kn, vn) in zip(c_app, new_kv)
        ]
        for a, bb in zip(jax.tree_util.tree_leaves(c_ref),
                         jax.tree_util.tree_leaves(c_app)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-4, atol=2e-5)


def test_decoder_anc_step_matches_cached():
    """score_step_anc over a never-reordered cache + ancestry table ==
    score_step_cached + physical reorder, across steps with random beam
    reordering (the default TPU decode protocol: the cache rows are storage
    slots; attend_kv_anc resolves history through the anc table)."""
    from tailored_avsr_tpu.decode.beam_search import (
        reorder_beam_rows,
        update_ancestry,
        write_beam_column,
    )

    key = jax.random.PRNGKey(11)
    b, k = 2, 3
    n = b * k
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    # memory is group-shared: the anc protocol's cross-attend takes B rows
    mem_b = jax.random.normal(key, (b, 7, D))
    mask_b = jnp.arange(7)[None, :] < jnp.array([7, 5])[:, None]
    mem = jnp.repeat(mem_b, k, axis=0)
    mem_mask = jnp.repeat(mask_b, k, axis=0)
    L = 6
    ys = jnp.zeros((n, L), jnp.int32).at[:, 0].set(V - 1)
    params = dec.init(key, mem, mem_mask, ys, jnp.full((n,), 1))
    mem_kv = dec.apply(params, mem, method="precompute_memory")
    mem_kv_b = dec.apply(params, mem_b, method="precompute_memory")
    c_ref = dec.init_cache(n, L)
    c_anc = dec.init_cache_group(b, k, L)
    anc = jnp.zeros((n, L), jnp.int32)
    rng = np.random.RandomState(13)
    for pos in range(1, L):
        lp_r, c_ref = dec.apply(params, mem_kv, mem_mask, ys, jnp.asarray(pos),
                                c_ref, method="score_step_cached")
        lp_a, new_kv = dec.apply(
            params, mem_kv_b, mask_b, ys, jnp.asarray(pos), c_anc, anc, k,
            method="score_step_anc",
        )
        np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_r),
                                   rtol=2e-4, atol=2e-5)
        src = jnp.asarray(rng.randint(0, k, (b, k)))
        g = (jnp.arange(b)[:, None] * k + src).reshape(n)
        ys = ys.at[:, pos].set(
            jnp.asarray(rng.randint(1, V - 1, size=(n,)))
        )[g]
        c_ref = jax.tree_util.tree_map(lambda x: reorder_beam_rows(x, src),
                                       c_ref)
        c_anc = [
            (write_beam_column(ck, kn, jnp.asarray(pos)),
             write_beam_column(cv, vn, jnp.asarray(pos)))
            for (ck, cv), (kn, vn) in zip(c_anc, new_kv)
        ]
        anc = update_ancestry(anc, g, src, jnp.asarray(pos))


def test_lm_anc_step_matches_cached():
    """TransformerLM.score_step_anc == score_step_cached + physical reorder
    across steps with random beam reordering."""
    from tailored_avsr_tpu.decode.beam_search import (
        reorder_beam_rows,
        update_ancestry,
        write_beam_column,
    )
    from tailored_avsr_tpu.models.lm import TransformerLM

    V2, b, k, L2 = 9, 2, 3, 7
    n = b * k
    lm = TransformerLM(vocab_size=V2, att_unit=16, head=2, unit=24, layer=2,
                       dropout_rate=0.0, positional_dropout_rate=0.0)
    key = jax.random.PRNGKey(17)
    ys = jax.random.randint(key, (n, L2), 0, V2)
    variables = lm.init(key, ys, jnp.full((n,), L2))
    c_ref = lm.apply(variables, n, L2, method=lambda m, *a: m.init_cache(*a))
    c_anc = lm.apply(variables, b, k, L2,
                     method=lambda m, *a: m.init_cache_group(*a))
    anc = jnp.zeros((n, L2), jnp.int32)
    rng = np.random.RandomState(19)
    for pos in range(1, L2):
        lp_r, c_ref = lm.apply(variables, ys, jnp.asarray(pos), c_ref,
                               method="score_step_cached")
        lp_a, new_kv = lm.apply(variables, ys, jnp.asarray(pos), c_anc, anc, k,
                                method="score_step_anc")
        np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_r),
                                   rtol=2e-4, atol=2e-5)
        src = jnp.asarray(rng.randint(0, k, (b, k)))
        g = (jnp.arange(b)[:, None] * k + src).reshape(n)
        ys = ys.at[:, pos].set(
            jnp.asarray(rng.randint(0, V2 - 1, size=(n,)))
        )[g]
        c_ref = jax.tree_util.tree_map(lambda x: reorder_beam_rows(x, src),
                                       c_ref)
        c_anc = [
            (write_beam_column(ck, kn, jnp.asarray(pos)),
             write_beam_column(cv, vn, jnp.asarray(pos)))
            for (ck, cv), (kn, vn) in zip(c_anc, new_kv)
        ]
        anc = update_ancestry(anc, g, src, jnp.asarray(pos))


def test_speech2text_append_protocol_matches_anc(tmp_path):
    """inference_conf cache_protocol 'append' (physical cache permutation)
    returns the same hypotheses as the default ancestry protocol."""
    import types
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    base = dict(
        task="asr",
        token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 32,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf={"beam_size": 3, "ctc_weight": 0.3, "lm_weight": 0.4,
                        "nbest": 2},
    )
    lm_cfg = types.SimpleNamespace(
        token_list=None, lm_conf={"att_unit": 16, "head": 2, "unit": 24,
                                  "layer": 2, "dropout_rate": 0.0},
    )
    rng = np.random.RandomState(23)
    B, S = 2, 640 * 6
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    s_anc = Speech2Text(types.SimpleNamespace(**base), lm_config=lm_cfg)
    res_anc = s_anc(batch)
    base2 = dict(base, inference_conf=dict(base["inference_conf"],
                                           cache_protocol="append"))
    s_app = Speech2Text(types.SimpleNamespace(**base2), lm_config=lm_cfg)
    s_app.ensure_params(batch)
    s_app.variables = s_anc.variables
    s_app.lm_variables = s_anc.lm_variables
    res_app = s_app(batch)
    assert [r[0] for r in res_anc] == [r[0] for r in res_app]


def test_beam_search_unroll_invariance():
    """unroll=2 (two beam steps per while-loop iteration, the TPU default)
    returns exactly the same n-best as unroll=1 — the at-most-one extra step
    past the stop condition is result-inert (see the cond note in
    beam_search)."""
    key = jax.random.PRNGKey(5)
    dec, params, mem, mem_mask, _ = make_decoder(key)
    t, b, k = 7, 2, 3
    ctc_logp = jax.nn.log_softmax(
        jax.random.normal(jax.random.fold_in(key, 4), (b, t, V)), -1
    )
    enc_lens = jnp.array([7, 5])

    def att_full(ys, pos):
        rep = ys.shape[0] // b
        m = jnp.repeat(mem, rep, axis=0)
        mm = jnp.repeat(mem_mask, rep, axis=0)
        return dec.apply(params, m, mm, ys, pos, method="score_step")

    for early_exit in (True, False):
        for penalty in (0.0, 0.4):
            res = {}
            for u in (1, 2):
                cfg = BeamSearchConfig(
                    beam_size=k, ctc_weight=0.3, penalty=penalty,
                    nbest=2, early_exit=early_exit, unroll=u,
                )
                res[u] = beam_search(
                    att_full, ctc_logp, enc_lens, V - 1, V - 1, cfg
                )
            np.testing.assert_array_equal(
                np.asarray(res[1].tokens), np.asarray(res[2].tokens)
            )
            np.testing.assert_allclose(
                np.asarray(res[1].scores), np.asarray(res[2].scores),
                atol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(res[1].lengths), np.asarray(res[2].lengths)
            )


def test_lm_cached_scoring_matches_full_recompute():
    """TransformerLM.score_step_cached over a decode loop == score_step
    (full-prefix recompute) at every position."""
    from tailored_avsr_tpu.models.lm import TransformerLM

    V2, N2, L2 = 9, 3, 7
    lm = TransformerLM(vocab_size=V2, att_unit=16, head=2, unit=24, layer=2,
                       dropout_rate=0.0, positional_dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    ys = jax.random.randint(key, (N2, L2), 0, V2)
    variables = lm.init(key, ys, jnp.full((N2,), L2))
    cache = lm.apply(variables, N2, L2, method=lambda m, *a: m.init_cache(*a))
    for pos in range(1, L2):
        want = lm.apply(variables, ys, jnp.asarray(pos), method="score_step")
        got, cache = lm.apply(variables, ys, jnp.asarray(pos), cache,
                              method="score_step_cached")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_speech2text_folded_lm_fusion_smoke(tmp_path):
    """Speech2Text with a shallow-fusion LM takes the folded cached path and
    produces the same hypotheses as the stateless-LM formulation."""
    import types
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    base = dict(
        task="asr",
        token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 32,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf={"beam_size": 2, "ctc_weight": 0.3, "lm_weight": 0.4},
    )
    lm_cfg = types.SimpleNamespace(
        token_list=None, lm_conf={"att_unit": 16, "head": 2, "unit": 24,
                                  "layer": 2, "dropout_rate": 0.0},
    )
    rng = np.random.RandomState(0)
    B, S = 2, 640 * 6
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    s2t = Speech2Text(types.SimpleNamespace(**base), lm_config=lm_cfg)
    res_folded = s2t(batch)
    assert len(res_folded) == B

    # same model/LM params, stateless-LM formulation: swap to a decoder
    # variant with no KV cache so _build_decode takes the lm_fn path
    s2t2 = Speech2Text(types.SimpleNamespace(**base), lm_config=lm_cfg)
    s2t2.variables = None
    s2t2.ensure_params(batch)
    s2t2.variables = s2t.variables
    s2t2.lm_variables = s2t.lm_variables
    object.__setattr__(s2t2.model.decoder, "layer_variant", "no_cache_test")
    res_stateless = s2t2(batch)
    assert [r[0] for r in res_folded] == [r[0] for r in res_stateless]


def test_segmented_cache_matches_plain():
    """score_step_cached_seg + gather_cache_seg == plain score_step_cached +
    full gather, across steps with beam reordering."""
    key = jax.random.PRNGKey(9)
    V2, D2, N, L = 9, 16, 4, 11
    dec = TransformerDecoder(
        vocab_size=V2, encoder_output_size=D2, attention_heads=4,
        linear_units=24, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    mem = jax.random.normal(key, (N, 7, D2))
    mmask = jnp.ones((N, 7), bool)
    ys = jnp.zeros((N, L), jnp.int32).at[:, 0].set(V2 - 1)
    params = dec.init(key, mem, mmask, ys, jnp.full((N,), 1))
    mem_kv = dec.apply(params, mem, method="precompute_memory")
    cache_p = dec.init_cache(N, L)
    cache_s = dec.apply(params, N, L, jnp.float32, 3, method="init_cache_seg")
    rng = np.random.RandomState(0)
    for pos in range(1, 7):
        lp_p, cache_p = dec.apply(params, mem_kv, mmask, ys, jnp.asarray(pos),
                                  cache_p, method="score_step_cached")
        lp_s, cache_s = dec.apply(params, mem_kv, mmask, ys, jnp.asarray(pos),
                                  cache_s, method="score_step_cached_seg")
        np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_p),
                                   rtol=2e-4, atol=2e-5)
        tok = jnp.asarray(rng.randint(1, V2 - 1, size=(N,)))
        ys = ys.at[:, pos].set(tok)
        g_src = jnp.asarray(rng.permutation(N))
        ys = ys[g_src]
        cache_p = jax.tree_util.tree_map(lambda x: x[g_src], cache_p)
        cache_s = TransformerDecoder.gather_cache_seg(
            cache_s, g_src, jnp.asarray(pos)
        )


def test_speech2text_segmented_cache_config_matches_default(tmp_path):
    """inference_conf cache_segments > 1 selects the segmented KV cache and
    produces the same hypotheses as the default contiguous cache."""
    import types
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    base = dict(
        task="asr",
        token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 32,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf={"beam_size": 2, "ctc_weight": 0.3},
    )
    rng = np.random.RandomState(1)
    B, S = 2, 640 * 6
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    s1 = Speech2Text(types.SimpleNamespace(**base))
    res_plain = s1(batch)
    base2 = dict(base, inference_conf=dict(base["inference_conf"],
                                           cache_segments=3))
    s2 = Speech2Text(types.SimpleNamespace(**base2))
    s2.ensure_params(batch)
    s2.variables = s1.variables
    res_seg = s2(batch)
    assert [r[0] for r in res_plain] == [r[0] for r in res_seg]


def test_speech2text_phase_widths_match_full(tmp_path):
    """inference_conf phase_widths (phased attend over the live cache prefix)
    returns exactly the same hypotheses and scores as the single full-width
    loop — columns >= pos-1 are masked dead in every formulation, and each
    phase only covers steps whose live prefix fits its width."""
    import types
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    base = dict(
        task="asr",
        token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 32,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf={"beam_size": 3, "ctc_weight": 0.3, "lm_weight": 0.4,
                        "nbest": 2, "early_exit": False},
    )
    lm_cfg = types.SimpleNamespace(
        token_list=None, lm_conf={"att_unit": 16, "head": 2, "unit": 24,
                                  "layer": 2, "dropout_rate": 0.0},
    )
    rng = np.random.RandomState(29)
    B, S = 2, 640 * 8
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    s_full = Speech2Text(types.SimpleNamespace(**base), lm_config=lm_cfg)
    res_full = s_full(batch)
    for widths in ([0.5], [8, 0.75], [4, 8, 12]):
        cfg2 = dict(base, inference_conf=dict(base["inference_conf"],
                                              phase_widths=widths))
        s_ph = Speech2Text(types.SimpleNamespace(**cfg2), lm_config=lm_cfg)
        s_ph.ensure_params(batch)
        s_ph.variables = s_full.variables
        s_ph.lm_variables = s_full.lm_variables
        res_ph = s_ph(batch)
        assert [r[0] for r in res_full] == [r[0] for r in res_ph], widths
