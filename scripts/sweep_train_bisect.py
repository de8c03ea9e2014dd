#!/usr/bin/env python
"""Train-step bisect at the sweep-winner batch (VERDICT r3 item 3 follow-up):
how much of the flagship train step is the visual frontend?

Times fwd+bwd of (a) the FULL product train step (train/loop.make_train_step,
donated state + bf16 mixed precision — the same operating point
scripts/sweep_train_cost.py measures) and (b) the Conv3dResNet18 frontend
alone under the same mixed-precision regime (grad of a scalar readout), with
XLA cost-analysis FLOPs per part. The emitted `bound` line is the
quantitative form of "train MFU is frontend-bound": the implied step time /
MFU if the frontend ran at the trunk's measured throughput vs at peak.

One JSON line per part; exits 0 even on per-part failure (error lines)."""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--diagnostics", action="store_true",
                    help="also run the named non-frontend diagnostics "
                         "(no_dropout, rbg_rng, fwd_only, opt_only, "
                         "ctc_w0/ctc_w1)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from __graft_entry__ import _build_flagship
    from tailored_avsr_tpu.models.frontends import Conv3dResNet18
    from tailored_avsr_tpu.train.loop import create_train_state, make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
    peak_tf = bench.peak_for(jax.devices()[0])
    tb, frames, iters = args.batch, args.frames, args.iters
    rng = np.random.RandomState(7)
    tsamples = frames * 640
    video = jnp.asarray(rng.randn(tb, frames, 88, 88).astype(np.float32))
    vlens = jnp.full((tb,), frames, np.int32)
    batch = (
        jnp.asarray(rng.randn(tb, tsamples).astype(np.float32) * 0.1),
        jnp.full((tb,), tsamples, np.int32),
        video,
        vlens,
        jnp.asarray(rng.randint(3, 30, (tb, 30)), np.int32),
        jnp.full((tb,), 30, np.int32),
    )
    compute_dtype = jnp.bfloat16 if on_tpu else None
    results = {}

    # (a) full product train step
    try:
        tmodel = _build_flagship(tiny=False, use_flash=False)
        tvars = tmodel.init(
            {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
            *(x[:2] for x in batch),
        )
        tx = optax.adamw(1e-3)
        step = make_train_step(
            tmodel, tx, donate=True, remat=False, compute_dtype=compute_dtype
        )
        key = jax.random.PRNGKey(3)
        state = create_train_state(tvars, tx)
        flops = bench.graph_flops(step, state, batch, key)
        state, stats = step(state, batch, key)
        np.asarray(jax.tree_util.tree_leaves(stats)[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            state, stats = step(state, batch, key)
            np.asarray(jax.tree_util.tree_leaves(stats)[0])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        line = {"part": "full_step", "batch": tb, "frames": frames,
                "ms": round(dt * 1e3, 1)}
        line.update(bench.perf_fields(flops, dt, peak_tf, tb))
        results["full"] = (dt, flops)
        print(json.dumps(line), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"part": "full_step", "error": repr(e)[:200]}),
              flush=True)

    # (b) visual frontend alone, same mixed-precision regime: f32 masters
    # cast to bf16 in the loss (grad-of-cast returns f32 grads)
    try:
        fe = Conv3dResNet18()
        fvars = fe.init({"params": jax.random.PRNGKey(0)}, video, vlens,
                        train=True)

        def _cast(tree):
            if compute_dtype is None:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                tree,
            )

        def fe_loss(params, bstats, v):
            out, upd = fe.apply(
                {"params": _cast(params), "batch_stats": _cast(bstats)},
                _cast(v), vlens, train=True, mutable=["batch_stats"],
            )
            return out[0].astype(jnp.float32).mean(), upd["batch_stats"]

        @jax.jit
        def fe_step(params, bstats, v):
            (loss, newbs), grads = jax.value_and_grad(
                fe_loss, has_aux=True)(params, bstats, v)
            return loss, grads, newbs

        p, bs = fvars["params"], fvars["batch_stats"]
        flops_fe = bench.graph_flops(fe_step, p, bs, video)
        loss, grads, _ = fe_step(p, bs, video)
        np.asarray(loss)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            loss, grads, _ = fe_step(p, bs, video)
            np.asarray(loss)
            times.append(time.perf_counter() - t0)
        dt_fe = min(times)
        line = {"part": "frontend_fwdbwd", "batch": tb, "frames": frames,
                "ms": round(dt_fe * 1e3, 1)}
        line.update(bench.perf_fields(flops_fe, dt_fe, peak_tf, tb))
        results["fe"] = (dt_fe, flops_fe)
        print(json.dumps(line), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"part": "frontend_fwdbwd", "error": repr(e)[:200]}),
              flush=True)

    # (c) named diagnostics for the non-frontend 46% (VERDICT r4 item 4:
    # "the rest runs at 13.1 TF/s"): each variant isolates one suspect.
    #   no_dropout — deterministic forward: dropout/specaug mask generation
    #                and their threefry RNG drop out of the graph
    #   rbg_rng    — product step, but the step key uses the 'rbg' PRNG
    #                (hardware RNG on TPU; threefry is VPU ALU-heavy)
    #   fwd_only   — loss forward without value_and_grad (fwd/bwd split)
    #   opt_only   — adamw update+apply alone on the full param tree (the
    #                f32 elementwise tail: ~1.4 GB of moment traffic/step)
    #   ctc_w0 / ctc_w1 — rebuild the model attention-only / CTC-only:
    #                names the CTC scan-DP and decoder shares
    def timeit(fn, *fargs):
        out = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*fargs)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            times.append(time.perf_counter() - t0)
        return min(times)

    def _cast2(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def variant_step(mdl, variables, deterministic=False):
        """Non-donating clone of the product loss+grad (no optimizer)."""
        bstats = variables.get("batch_stats", {})

        def loss_fn(params, bs, b, rng):
            rngs = {
                name: jax.random.fold_in(rng, i)
                for i, name in enumerate(("dropout", "skip", "specaug", "mlm"))
            }
            vs = {"params": _cast2(params)}
            if bs:
                vs["batch_stats"] = bs
                (loss, _), nv = mdl.apply(
                    vs, *(_cast2(x) if hasattr(x, "dtype")
                          and x.dtype == jnp.float32 else x for x in b),
                    deterministic=deterministic, rngs=rngs,
                    mutable=["batch_stats"],
                )
                return loss, nv.get("batch_stats", bs)
            loss, _ = mdl.apply(vs, *b, deterministic=deterministic, rngs=rngs)
            return loss, bs

        @jax.jit
        def step_fn(params, bs, b, rng):
            (loss, nbs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bs, b, rng)
            return loss, grads, nbs

        return step_fn, variables["params"], bstats

    if args.diagnostics:
        try:  # no_dropout vs a matched exact baseline (grads_only)
            sfn, p, bs = variant_step(tmodel, tvars, deterministic=False)
            dt_g = timeit(sfn, p, bs, batch, key)
            fl_g = bench.graph_flops(sfn, p, bs, batch, key)
            line = {"part": "grads_only", "batch": tb, "ms": round(dt_g * 1e3, 1)}
            line.update(bench.perf_fields(fl_g, dt_g, peak_tf, tb))
            print(json.dumps(line), flush=True)
            sfn_d, p, bs = variant_step(tmodel, tvars, deterministic=True)
            dt_d = timeit(sfn_d, p, bs, batch, key)
            print(json.dumps({
                "part": "no_dropout", "batch": tb, "ms": round(dt_d * 1e3, 1),
                "dropout_rng_ms": round((dt_g - dt_d) * 1e3, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"part": "no_dropout", "error": repr(e)[:200]}),
                  flush=True)

        try:  # rbg PRNG for the mask generation
            sfn, p, bs = variant_step(tmodel, tvars, deterministic=False)
            rbg_key = jax.random.key(3, impl="rbg")
            dt_r = timeit(sfn, p, bs, batch, rbg_key)
            print(json.dumps({
                "part": "rbg_rng", "batch": tb, "ms": round(dt_r * 1e3, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"part": "rbg_rng", "error": repr(e)[:200]}),
                  flush=True)

        try:  # forward-only loss
            def fwd(params, bs, b, rng):
                rngs = {
                    name: jax.random.fold_in(rng, i)
                    for i, name in enumerate(("dropout", "skip", "specaug",
                                              "mlm"))
                }
                vs = {"params": _cast2(params), "batch_stats": bs}
                (loss, _), _ = tmodel.apply(
                    vs, *(_cast2(x) if hasattr(x, "dtype")
                          and x.dtype == jnp.float32 else x for x in b),
                    deterministic=False, rngs=rngs, mutable=["batch_stats"],
                )
                return loss

            jfwd = jax.jit(fwd)
            p, bs = tvars["params"], tvars.get("batch_stats", {})
            dt_f = timeit(jfwd, p, bs, batch, key)
            fl_f = bench.graph_flops(jfwd, p, bs, batch, key)
            line = {"part": "fwd_only", "batch": tb, "ms": round(dt_f * 1e3, 1)}
            line.update(bench.perf_fields(fl_f, dt_f, peak_tf, tb))
            print(json.dumps(line), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"part": "fwd_only", "error": repr(e)[:200]}),
                  flush=True)

        try:  # optimizer tail alone
            grads = jax.tree_util.tree_map(jnp.ones_like, tvars["params"])
            opt_state = tx.init(tvars["params"])

            @jax.jit
            def opt_step(g, s, p):
                u, s2 = tx.update(g, s, p)
                return optax.apply_updates(p, u), s2

            dt_o = timeit(opt_step, grads, opt_state, tvars["params"])
            print(json.dumps({
                "part": "opt_only", "batch": tb, "ms": round(dt_o * 1e3, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"part": "opt_only", "error": repr(e)[:200]}),
                  flush=True)

        for wname, w in (("ctc_w0", 0.0), ("ctc_w1", 1.0)):
            try:  # attention-only / CTC-only loss graphs
                from __graft_entry__ import _flagship_cfg
                from tailored_avsr_tpu.tasks.avsr import AVSRTask

                cfg = _flagship_cfg(tiny=False, use_flash=False)
                cfg.model_conf = dict(cfg.model_conf, ctc_weight=w)
                token_list = [ln.rstrip() for ln in
                              open("tokenizers/char/spanish.txt") if ln.rstrip()]
                vmodel = AVSRTask.build_model(cfg, token_list)
                vvars = vmodel.init(
                    {"params": jax.random.PRNGKey(0),
                     "mlm": jax.random.PRNGKey(1)},
                    *(x[:2] for x in batch),
                )
                sfn, p, bs = variant_step(vmodel, vvars)
                dt_v = timeit(sfn, p, bs, batch, key)
                fl_v = bench.graph_flops(sfn, p, bs, batch, key)
                line = {"part": wname, "batch": tb, "ms": round(dt_v * 1e3, 1)}
                line.update(bench.perf_fields(fl_v, dt_v, peak_tf, tb))
                print(json.dumps(line), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"part": wname, "error": repr(e)[:200]}),
                      flush=True)

    # derived bound: what the step would cost if the frontend were free /
    # ran at peak — the MFU ceiling the lane-starved stem imposes
    if "full" in results and "fe" in results:
        (dt, flops), (dt_fe, flops_fe) = results["full"], results["fe"]
        rest_dt = max(dt - dt_fe, 1e-9)
        rest_flops = (flops or 0) - (flops_fe or 0)
        out = {
            "part": "bound",
            "frontend_share_pct": round(100 * dt_fe / dt, 1),
            "frontend_tf_per_sec": round((flops_fe or 0) / dt_fe / 1e12, 1),
            "rest_tf_per_sec": round(rest_flops / rest_dt / 1e12, 1),
        }
        if peak_tf and flops:
            # ceiling: frontend at peak, rest unchanged
            dt_ceiling = rest_dt + (flops_fe or 0) / (peak_tf * 1e12)
            out["mfu_now_pct"] = round(100 * flops / dt / (peak_tf * 1e12), 1)
            out["mfu_frontend_at_peak_pct"] = round(
                100 * flops / dt_ceiling / (peak_tf * 1e12), 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
