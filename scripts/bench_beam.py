"""Bench: full joint CTC/attention beam-search loop at DESIGN.md dims.

Synthetic encoder output (B=8 utterances, T=102 frames, D=256, V=41),
6-layer transformer decoder with the KV-cache fast path, beam 10 — the
end-to-end jitted decode graph of Speech2Text minus the encoder.
"""

import time

import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode.beam_search import BeamSearchConfig, beam_search
from tailored_avsr_tpu.models.decoder import TransformerDecoder

B, T, V, D, BEAM = 8, 102, 41, 256, 10
N = B * BEAM


def main(dtype=jnp.float32):
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=2048, num_blocks=6, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    key = jax.random.PRNGKey(0)
    memory = jax.random.normal(key, (B, T, D), dtype)
    enc_lens = jnp.full((B,), T, jnp.int32)
    ctc_logp = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(1), (B, T, V)), axis=-1
    )
    ys0 = jnp.full((N, 8), V - 1, jnp.int32)
    variables = dec.init(key, memory, None, ys0[:B], jnp.full((B,), 8))
    if dtype == jnp.bfloat16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables,
        )

    cfg = BeamSearchConfig(beam_size=BEAM, ctc_weight=0.3)

    @jax.jit
    def decode(memory, ctc_logp, enc_lens):
        mem_kv = dec.apply(
            variables, memory, method=lambda m, x: m.precompute_memory(x)
        )
        mem_kv = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, BEAM, axis=0), mem_kv
        )
        att_state = dec.init_cache(N, T, dtype=memory.dtype)

        def att_fn(ys, pos, cache):
            return dec.apply(
                variables, mem_kv, None, ys, pos, cache,
                method=lambda m, *a: m.score_step_cached(*a),
            )

        return beam_search(
            att_fn, ctc_logp, enc_lens, sos=V - 2, eos=V - 1, config=cfg,
            att_state=att_state,
        )

    t0 = time.perf_counter()
    res = decode(memory, ctc_logp, enc_lens)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(5):
        mem = memory + jnp.asarray(1e-6 * (i + 1), dtype)
        mem.block_until_ready()
        t0 = time.perf_counter()
        jax.block_until_ready(decode(mem, ctc_logp, enc_lens))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    audio_s = B * T * 4 / 100.0  # 102 frames ~ 4 s at 25 fps
    print(
        f"beam loop ({jnp.dtype(dtype).name}): {ms:.1f} ms for {B}x{T} steps"
        f"  ({ms / T * 1e3:.0f} us/step, {audio_s / (ms / 1e3):.0f}x RT)"
        f"  [compile {compile_s:.0f} s]"
    )


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    main(jnp.float32)
    main(jnp.bfloat16)
