"""Micro-bench: CTC prefix scorer step cost inside a decode-style loop.

Compares the time-minor associative-scan prefix DP (decode/ctc_prefix.py)
against the previous candidate-minor sequential lax.scan formulation at
joint-beam-search dims, reporting ms/100 steps on the default device.
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import time

import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode.ctc_prefix import (
    NEG_INF,
    ctc_prefix_init_state,
    ctc_prefix_score_step,
    ctc_prefix_select,
    neutralize_padding,
    to_time_minor,
)

N, T, V, P = 80, 102, 41, 15  # beam 10, pre-beam 15 (the DESIGN.md dims)
STEPS = 100


# ---------------------------------------------------------------- old layout
def old_init(logp):
    n, t, _ = logp.shape
    r_b = jnp.cumsum(logp[:, :, 0], axis=1)
    r_n = jnp.full((n, t), NEG_INF)
    return (
        jnp.stack([r_n, r_b], axis=-1),  # (N, T, 2)
        jnp.zeros((n,)),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.int32),
    )


def old_step(logp, state, cand_ids, eos_id, blank_id=0):
    r, score, last, length = state
    n, t, v = logp.shape
    p = cand_ids.shape[1]
    xc = jnp.take_along_axis(logp, cand_ids[:, None, :].repeat(t, 1), axis=2)
    x_blank = logp[:, :, blank_id]
    r_n_prev, r_b_prev = r[..., 0], r[..., 1]
    same_as_last = cand_ids == last[:, None]
    phi = jnp.logaddexp(
        r_b_prev[:, :, None],
        jnp.where(same_as_last[:, None, :], NEG_INF, r_n_prev[:, :, None]),
    )
    empty = (length == 0)[:, None]
    phi_prev0 = jnp.where(empty, 0.0, NEG_INF)
    phi_shifted = jnp.concatenate(
        [jnp.broadcast_to(phi_prev0, (n, p))[None], phi.transpose(1, 0, 2)[:-1]],
        axis=0,
    )
    xs = (xc.transpose(1, 0, 2), x_blank.transpose(1, 0), phi_shifted)

    def scan_step(carry, inputs):
        r_n_tm1, r_b_tm1 = carry
        xc_t, xb_t, phi_tm1 = inputs
        r_b_t = jnp.logaddexp(r_b_tm1, r_n_tm1) + xb_t[:, None]
        r_n_t = jnp.logaddexp(r_n_tm1, phi_tm1) + xc_t
        return (r_n_t, r_b_t), (r_n_t, r_b_t, phi_tm1 + xc_t)

    init = (jnp.full((n, p), NEG_INF), jnp.full((n, p), NEG_INF))
    _, (r_n_all, r_b_all, psi_terms) = jax.lax.scan(scan_step, init, xs)
    psi = jax.nn.logsumexp(psi_terms, axis=0)
    prefix_final = jnp.logaddexp(r_n_prev[:, -1], r_b_prev[:, -1])
    psi = jnp.where(cand_ids == eos_id, prefix_final[:, None], psi)
    psi = jnp.where(cand_ids == blank_id, NEG_INF, psi)
    r_new = jnp.stack([r_n_all, r_b_all], axis=2).transpose(1, 0, 2, 3)
    return psi, r_new  # r_new (N, T, 2, P)


def old_select(state, psi, r_new, cand_ids, src_hyp, sel_cand):
    _, _, _, length = state
    idx = jnp.arange(src_hyp.shape[0])
    r_sel = r_new[src_hyp][idx, :, :, sel_cand]
    return (
        r_sel,
        psi[src_hyp][idx, sel_cand],
        cand_ids[src_hyp][idx, sel_cand],
        length[src_hyp] + 1,
    )


def make_loop_old(logp, cand):
    @jax.jit
    def loop(logp, cand):
        state = old_init(logp)

        def body(i, state):
            psi, r_new = old_step(logp, state, cand, eos_id=V - 1)
            sel = jnp.argmax(psi, axis=1)
            src = jnp.arange(N)
            return old_select(state, psi, r_new, cand, src, sel)

        state = jax.lax.fori_loop(0, STEPS, body, state)
        return state[1]

    return loop


def make_loop_new(logp, cand):
    @jax.jit
    def loop(logp, cand):
        logp_vt = to_time_minor(logp)
        state = ctc_prefix_init_state(logp_vt)

        def body(i, state):
            psi, r_new = ctc_prefix_score_step(logp_vt, state, cand, eos_id=V - 1)
            sel = jnp.argmax(psi, axis=1)
            src = jnp.arange(N)
            return ctc_prefix_select(state, psi, r_new, cand, src, sel)

        state = jax.lax.fori_loop(0, STEPS, body, state)
        return state.score

    return loop


def main():
    key = jax.random.PRNGKey(0)
    logp = jax.nn.log_softmax(jax.random.normal(key, (N, T, V)), axis=-1)
    logp = neutralize_padding(logp, jnp.full((N,), T, jnp.int32))
    cand = jax.random.randint(jax.random.PRNGKey(1), (N, P), 2, V)

    print("device:", jax.devices()[0])
    for name, mk in [("new(time-minor assoc)", make_loop_new),
                     ("old(cand-minor seq)  ", make_loop_old)]:
        loop = mk(logp, cand)
        t0 = time.perf_counter()
        out = loop(logp, cand)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        checksum = float(jnp.sum(out))
        times = []
        for i in range(5):
            lp = logp + 1e-6 * i
            lp.block_until_ready()
            t0 = time.perf_counter()
            out = loop(lp, cand)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        print(
            f"{name}: {ms:8.3f} ms / {STEPS} steps ({ms / STEPS * 1e3:7.1f} us/step)"
            f"  checksum={checksum:.3f}  [compile {compile_s:.1f} s]"
        )


if __name__ == "__main__":
    main()
