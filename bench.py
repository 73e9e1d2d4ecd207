"""Benchmark: DQL action-sampling throughput on one TPU chip.

Measures the BASELINE.json config #1 hot path — DQLMlp denoiser, 5-step DDPM
sampling at the reference's eval scale (50 envs x 50 candidates = 2500
actions per call; configs/dql/mujoco/mujoco.yaml) — and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares the fused lax.scan sampler (one XLA program for the
whole k-step denoise loop) against a reference-style per-step dispatch
implementation (one jitted program per NFE, Python loop on the host —
faithful to the reference's torch eager loop, diffusionsde.py:525-594) run
on the SAME chip. The reference repo publishes no timing numbers
(BASELINE.md), so same-hardware dispatch-style speedup is the honest
measurable ratio; absolute throughput is recorded for cross-hardware
comparison against A100 PyTorch later.
"""

import json
import os
import time

import jax

# jax is pre-imported at interpreter startup here, so JAX_PLATFORMS from the
# environment is ignored; BENCH_PLATFORM=cpu switches in-process (dev smokes)
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE
from cleandiffuser_tpu.nn_condition import IdentityCondition
from cleandiffuser_tpu.nn_diffusion import DQLMlp

OBS_DIM, ACT_DIM = 17, 6  # halfcheetah
BATCH = 50 * 50  # num_envs * num_candidates (reference eval scale)
SAMPLE_STEPS = 5
N_WARMUP, N_ITERS = 3, 20


def build_engine():
    return DiscreteDiffusionSDE(
        DQLMlp(obs_dim=OBS_DIM, act_dim=ACT_DIM, emb_dim=64),
        IdentityCondition(dropout=0.0),
        x_max=np.ones((ACT_DIM,)),
        x_min=-np.ones((ACT_DIM,)),
        diffusion_steps=SAMPLE_STEPS,
        rng=0,
    )


def time_stats(fn, *args, n_warmup=N_WARMUP, n_iters=N_ITERS):
    """(median, rel_spread) of per-call seconds over n_iters timed calls.

    Each call fetches a scalar to force completion (block_until_ready does
    not block through the tunnel). The TPU is reached through a tunnel with
    ~30ms round-trip, so fn should amortize many sampler calls internally;
    callers subtract the measured empty round-trip floor. rel_spread is
    (max-min)/median — the honest noise bar for every reported speedup
    (round-4 lesson: single-shot timings swung bf16 claims 0.58x<->1.26x)."""
    for _ in range(n_warmup):
        float(fn(*args))
    ts = []
    for _ in range(max(n_iters, 3)):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / max(med, 1e-12)
    return med, spread


def time_fn(fn, *args, n_warmup=N_WARMUP, n_iters=N_ITERS):
    """Median per-call seconds (see time_stats)."""
    return time_stats(fn, *args, n_warmup=n_warmup, n_iters=n_iters)[0]


def round_trip_floor():
    f = jax.jit(lambda x: x.sum())
    x = jnp.zeros((8, 128))
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x))
    return (time.perf_counter() - t0) / 10


# TPU v5e peak: 1.97e14 bf16 FLOP/s per chip (jax-ml.github.io/scaling-book
# hardware table). f32 compute paths understate MFU against this denominator
# (the MXU runs f32 via passes); that conservatism is intentional.
PEAK_FLOPS = {"tpu": 1.97e14}


def cost_of(fn, *args):
    """XLA-reported (flops, bytes accessed) of one call (cost analysis)."""
    try:
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def flops_of(fn, *args) -> float:
    return cost_of(fn, *args)[0]


def mfu_pct(flops_per_call: float, sec_per_call: float):
    peak = PEAK_FLOPS.get(jax.devices()[0].platform)
    if not peak or not flops_per_call or sec_per_call <= 0:
        return None
    return round(100.0 * flops_per_call / sec_per_call / peak, 2)


# v5e HBM bandwidth; with PEAK_FLOPS this turns raw MFU into a roofline
# position: small-model RL workloads are BANDWIDTH/overhead-bound, so %
# of roofline (max of compute-time and memory-time over measured time) is
# the honest utilization number — single-digit MFU on an MLP policy can
# still be near its roofline.
PEAK_BW = {"tpu": 8.19e11}


def roofline_pct(flops: float, bytes_: float, sec: float):
    pf = PEAK_FLOPS.get(jax.devices()[0].platform)
    pb = PEAK_BW.get(jax.devices()[0].platform)
    if not pf or not pb or sec <= 0 or (not flops and not bytes_):
        return None
    t_floor = max(flops / pf, bytes_ / pb)
    return round(100.0 * t_floor / sec, 2)


def bench_planner(name, nn_diffusion, x_shape, batch, steps, repeat=10,
                  floor=0.0, cond_dim=None, bf16=False):
    """Throughput of a trajectory-planner sampling program (plans/sec)."""
    from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE

    engine = DiscreteDiffusionSDE(nn_diffusion, diffusion_steps=steps, rng=0)
    engine.bf16_sampling = bf16
    prior = jnp.zeros((batch,) + x_shape)
    engine.init(prior)
    sample_fn = engine.build_sample_fn(
        solver="ddpm", sample_steps=steps, cfg_mode="uncond", final_logp=False
    )

    @jax.jit
    def run_many(params, r):
        def body(carry, _):
            r, acc = carry
            r, k = jax.random.split(r)
            x, _ = sample_fn(params, None, k, prior)
            return (r, acc + x.sum()), None

        (_, acc), _ = jax.lax.scan(body, (r, 0.0), None, length=repeat)
        return acc

    # clamp: tiny fused programs can measure below the tunnel floor
    med, spread = time_stats(run_many, engine.state.ema_params,
                             jax.random.PRNGKey(0), n_warmup=1, n_iters=5)
    t = max(med - floor, 1e-7) / repeat
    fl, by = cost_of(
        lambda p, r: sample_fn(p, None, r, prior)[0].sum(),
        engine.state.ema_params, jax.random.PRNGKey(0),
    )
    out = {f"{name}_plans_per_sec": round(batch / t, 1),
           f"{name}_ms_per_batch": round(t * 1e3, 3),
           f"{name}_spread_pct": round(100 * spread, 1)}
    m = mfu_pct(fl, t)
    if m is not None:
        out[f"{name}_mfu_pct"] = m
    r = roofline_pct(fl, by, t)
    if r is not None:
        out[f"{name}_roofline_pct"] = r
    return out


def bench_sampler_family(name, engine, sample_kwargs, prior, floor,
                         repeat=10, cond=None):
    """Throughput + MFU of an engine's fused sampling program."""
    sample_fn = engine.build_sample_fn(**sample_kwargs)
    kw = {} if cond is None else {"condition_cfg": cond, "w_cfg": 1.0}

    def build(reps):
        @jax.jit
        def run_many(params, r):
            def body(carry, _):
                r, acc = carry
                r, k = jax.random.split(r)
                x, _ = sample_fn(params, None, k, prior, **kw)
                return (r, acc + x.sum()), None

            (_, acc), _ = jax.lax.scan(body, (r, 0.0), None, length=reps)
            return acc

        return run_many

    # tiny fused programs (e.g. consistency 2-NFE on an MLP) can run far
    # below the ~30ms tunnel floor at the requested repeat — escalate the
    # in-program repeat until the signal clears the floor, instead of
    # clamping to a meaningless 1e-7 (BENCH_r02 reported 178413% MFU here)
    reps = repeat
    for attempt in range(4):
        total, spread = time_stats(build(reps), engine.state.ema_params,
                                   jax.random.PRNGKey(0), n_warmup=1,
                                   n_iters=5)
        if total - floor >= max(floor, 1e-3) or attempt == 3:
            break  # keep reps == what `total` was measured at
        reps *= 10
    t = max(total - floor, 1e-7) / reps
    fl, by = cost_of(
        lambda p, r: sample_fn(p, None, r, prior, **kw)[0].sum(),
        engine.state.ema_params, jax.random.PRNGKey(0),
    )
    batch = prior.shape[0]
    out = {f"{name}_samples_per_sec": round(batch / t, 1),
           f"{name}_ms_per_batch": round(t * 1e3, 3),
           f"{name}_spread_pct": round(100 * spread, 1)}
    m = mfu_pct(fl, t)
    if m is not None:
        out[f"{name}_mfu_pct"] = m
    r = roofline_pct(fl, by, t)
    if r is not None:
        out[f"{name}_roofline_pct"] = r
    return out


def extended_benches(floor):
    """VERDICT r1 item 5: bench breadth — EDM heun / RF 1-NFE (the
    DiffuserLite real-time claim, ref diffuserlite_d4rl_mujoco.py:259) /
    consistency 2-NFE samplers, DP ChiUNet fused train window, DD DiT
    train step, and the fully on-device DP receding-horizon eval."""
    import numpy as np

    from cleandiffuser_tpu.diffusion import (
        ContinuousConsistencyModel,
        ContinuousEDM,
        ContinuousRectifiedFlow,
    )
    from cleandiffuser_tpu.nn_diffusion import DiT1d, JannerUNet1d

    out = {}
    H, D = 32, 23  # diffuser mujoco trajectory shape (obs 17 + act 6)
    B = 50 * 64

    # --- EDM heun (2 NFE/step) at diffuser planner scale ---
    try:
        edm = ContinuousEDM(
            JannerUNet1d(in_dim=D, model_dim=32, emb_dim=32, kernel_size=5),
            rng=0)
        prior = jnp.zeros((B, H, D))
        edm.init(prior)
        out.update(bench_sampler_family(
            "edm_heun_janner_h32", edm,
            dict(solver="heun", sample_steps=20, cfg_mode="uncond",
                 final_logp=False),
            prior, floor, repeat=3))
    except Exception as e:
        out["edm_bench_error"] = str(e)[:160]

    # --- RF 1-NFE: DiffuserLite real-time plan rate (DiT1d, leaf level) ---
    try:
        rf = ContinuousRectifiedFlow(
            DiT1d(in_dim=D, emb_dim=128, d_model=256, n_heads=8, depth=2,
                  timestep_emb_type="fourier"),
            rng=0)
        prior_rf = jnp.zeros((50, 9, D))  # 50 envs, L=9 diffuserlite level
        rf.init(prior_rf)
        out.update(bench_sampler_family(
            "rf_1nfe_dit_l9", rf,
            dict(sample_steps=1, cfg_mode="uncond"),
            prior_rf, floor, repeat=50))
    except Exception as e:
        out["rf_bench_error"] = str(e)[:160]

    # --- consistency model 2-NFE ---
    try:
        from cleandiffuser_tpu.nn_diffusion import DQLMlp

        cm = ContinuousConsistencyModel(
            DQLMlp(obs_dim=OBS_DIM, act_dim=ACT_DIM, emb_dim=64), rng=0)
        prior_cm = jnp.zeros((BATCH, ACT_DIM))
        obs_cm = jnp.asarray(np.random.randn(BATCH, OBS_DIM), jnp.float32)
        cm.init(prior_cm, obs_cm)
        out.update(bench_sampler_family(
            "consistency_2nfe_dqlmlp", cm,
            dict(sample_steps=2, cfg_mode="cond"),
            prior_cm, floor, repeat=20, cond=obs_cm))
    except Exception as e:
        out["cm_bench_error"] = str(e)[:160]

    # --- DP ChiUNet fused train window (gather+update in one scan) ---
    try:
        from cleandiffuser_tpu.dataset import PushTStateDataset, generate_pusht_demos
        from cleandiffuser_tpu.pipelines import DPPipeline

        rb = generate_pusht_demos(n_episodes=8, max_steps=60, seed=0)
        ds = PushTStateDataset(rb, horizon=16, pad_before=1, pad_after=7)
        pipe = DPPipeline(obs_dim=5, action_dim=2, horizon=16, obs_steps=2,
                          action_steps=8, nn="chi_unet", diffusion="ddpm",
                          sample_steps=5, gradient_steps=10_000, rng=0)
        N = 100
        train_window = pipe.make_train_scan(ds, 256, N)
        med, spread = time_stats(
            lambda k: train_window(k)["loss"], jax.random.PRNGKey(1),
            n_warmup=1, n_iters=5)
        t = (med - floor) / N
        out["dp_chiunet_train_steps_per_sec"] = round(1.0 / t, 1)
        out["dp_chiunet_train_ms_per_step"] = round(t * 1e3, 3)
        out["dp_chiunet_train_spread_pct"] = round(100 * spread, 1)
        raw = pipe.agent._make_update_fn(update_ema=True, has_wrt=False)
        raw = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw
        batch = ds.sample_batch(jax.random.PRNGKey(2), 256)
        fl, by = cost_of(
            lambda s, x, c: raw(s, x, c, None)[1]["loss"],
            pipe.agent.state, batch["action"],
            batch["obs"]["state"][:, :2, :])
        m = mfu_pct(fl, t)
        if m is not None:
            out["dp_chiunet_train_mfu_pct"] = m
        r = roofline_pct(fl, by, t)
        if r is not None:
            out["dp_chiunet_train_roofline_pct"] = r

        # bf16_training variant (fresh pipe: the flag keys no cache)
        try:
            from cleandiffuser_tpu.diffusion.basic import DiffusionModel

            DiffusionModel.bf16_training = True
            pipe16 = DPPipeline(obs_dim=5, action_dim=2, horizon=16,
                                obs_steps=2, action_steps=8, nn="chi_unet",
                                diffusion="ddpm", sample_steps=5,
                                gradient_steps=10_000, rng=0)
            win16 = pipe16.make_train_scan(ds, 256, N)
            med16, spread16 = time_stats(
                lambda k: win16(k)["loss"], jax.random.PRNGKey(1),
                n_warmup=1, n_iters=5)
            t16 = (med16 - floor) / N
            out["dp_chiunet_train_bf16_steps_per_sec"] = round(1.0 / t16, 1)
            out["dp_chiunet_train_bf16_speedup"] = round(t / t16, 3)
            # combined noise bar on the ratio (round-4 lesson: a
            # single-shot 0.58x and 1.26x were both reported for this
            # entry across rounds; the spread decides which is real)
            out["dp_chiunet_train_bf16_spread_pct"] = round(
                100 * (spread + spread16), 1)
        except Exception as e:  # keep the eval benches below alive
            out["dp_bf16_bench_error"] = str(e)[:160]
        finally:
            DiffusionModel.bf16_training = False

        # --- fully on-device receding-horizon eval (policy + env steps) ---
        from cleandiffuser_tpu.env.pusht_jax import PushTEnvJax

        env = PushTEnvJax()
        E, T = 50, 296
        t0 = time.perf_counter()
        pipe.evaluate_on_device(env, ds.normalizer, num_envs=E,
                                max_episode_steps=300)
        t_first = time.perf_counter() - t0
        evals = []
        for _ in range(5):
            t0 = time.perf_counter()
            pipe.evaluate_on_device(env, ds.normalizer, num_envs=E,
                                    max_episode_steps=300)
            evals.append(time.perf_counter() - t0 - floor)
        evals.sort()
        t_eval = evals[len(evals) // 2]
        out["dp_eval_env_steps_per_sec"] = round(E * T / t_eval, 1)
        out["dp_eval_s_per_50env_episode"] = round(t_eval, 3)
        out["dp_eval_spread_pct"] = round(
            100 * (evals[-1] - evals[0]) / t_eval, 1)
        out["dp_eval_compile_s"] = round(t_first - t_eval, 1)
    except Exception as e:
        out["dp_bench_error"] = str(e)[:160]

    # --- DD DiT train step ---
    try:
        from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE as DDS

        dit = DDS(
            DiT1d(in_dim=17, emb_dim=128, d_model=320, n_heads=10, depth=2,
                  timestep_emb_type="fourier"),
            diffusion_steps=20, rng=0)
        x_ex = jnp.zeros((64, 32, 17))
        dit.init(x_ex)
        raw = dit._make_update_fn(update_ema=True, has_wrt=False)
        raw = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw
        N = 100

        @jax.jit
        def train_many(state, r):
            def body(carry, k):
                state = carry
                x = jax.random.normal(k, x_ex.shape)
                state, log = raw(state, x, None, None)
                return state, log["loss"]

            keys = jax.random.split(r, N)
            state, losses = jax.lax.scan(body, state, keys)
            return state, losses.mean()

        state2, l = train_many(dit.state, jax.random.PRNGKey(0))
        _ = float(l)
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            state2, l = train_many(state2, jax.random.PRNGKey(1 + i))
            _ = float(l)
            ts.append(time.perf_counter() - t0 - floor)
        ts.sort()
        t = ts[len(ts) // 2] / N
        out["dd_dit_train_steps_per_sec"] = round(1.0 / t, 1)
        out["dd_dit_train_spread_pct"] = round(
            100 * (ts[-1] - ts[0]) / ts[len(ts) // 2], 1)
        fl, by = cost_of(
            lambda s, x: raw(s, x, None, None)[1]["loss"], dit.state, x_ex)
        m = mfu_pct(fl, t)
        if m is not None:
            out["dd_dit_train_mfu_pct"] = m
        r = roofline_pct(fl, by, t)
        if r is not None:
            out["dd_dit_train_roofline_pct"] = r
    except Exception as e:
        out["dd_train_bench_error"] = str(e)[:160]

    # --- fused Pallas adaLN-Zero DiT block: XLA vs kernel at DD candidate
    # eval scale (ops/dit_block.py; production gate B*H >= 2048) ---
    try:
        from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE as DDS

        B_dd, H_dd = 50 * 64, 32
        prior_dd = jnp.zeros((B_dd, H_dd, 17))
        times = {}
        for flag in (False, True):
            for bf16 in (False, True):
                key = ("pallas" if flag else "xla") + ("_bf16" if bf16
                                                       else "")
                try:  # one combo failing must not wipe the others' entries
                    eng = DDS(
                        DiT1d(in_dim=17, emb_dim=128, d_model=320,
                              n_heads=10, depth=2,
                              timestep_emb_type="fourier",
                              use_pallas_block=flag),
                        diffusion_steps=20, rng=0)
                    eng.bf16_sampling = bf16
                    eng.init(prior_dd)
                    res = bench_sampler_family(
                        f"dd_dit_sample_{key}", eng,
                        dict(solver="ddpm", sample_steps=20,
                             cfg_mode="uncond", final_logp=False),
                        prior_dd, floor, repeat=3)
                    out.update(res)
                    tkey = f"dd_dit_sample_{key}_ms_per_batch"
                    if tkey in res:
                        times[key] = res[tkey]
                except Exception as e:
                    out[f"dd_dit_sample_{key}_error"] = str(e)[:160]
        if "xla" in times and "pallas" in times and times["pallas"] > 0:
            out["pallas_dit_block_speedup"] = round(
                times["xla"] / times["pallas"], 3)
            # XLA's cost analysis can't see inside the Pallas kernel, so
            # its flops AND bytes counts underreport — the model flops and
            # HBM traffic are identical on both paths; rescale both the
            # XLA MFU and roofline by the time ratio (round-4 bug: the
            # raw pallas roofline_pct came out BELOW its own MFU)
            ratio = times["xla"] / times["pallas"]
            for suffix in ("mfu_pct", "roofline_pct"):
                xk = f"dd_dit_sample_xla_{suffix}"
                if xk in out:
                    out[f"dd_dit_sample_pallas_{suffix}"] = round(
                        out[xk] * ratio, 2)
        if "xla" in times and times.get("pallas_bf16"):
            # the production lever: best precision+kernel combo vs the
            # r04 default (f32 XLA) on the identical sampling program
            out["dd_dit_sample_best_speedup_vs_f32xla"] = round(
                times["xla"] / min(v for v in times.values() if v > 0), 3)
    except Exception as e:
        out["pallas_dit_bench_error"] = str(e)[:160]

    # --- parallel-in-time DDIM (Picard sweeps, arXiv:2305.16317) vs
    # sequential DDIM. ParaDiGMS wins when each sequential step UNDERFILLS
    # the chip (latency-bound, compute-rich): the sweep trades 20 tiny
    # calls for 6 calls each 20x wider. Bench three regimes: the r3
    # planner batch (50 envs, depth-2 DD planner — each step already wide,
    # expected LOSS), and single/small-batch deep-DiT real-time control
    # (batch 1 / 4, d384x12 — the paper's setting). ---
    try:
        from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE as DDS

        def run_repeat(eng_p, fn_call, reps):
            @jax.jit
            def run_many(params, r):
                def body(carry, _):
                    r, acc = carry
                    r, k = jax.random.split(r)
                    acc = acc + fn_call(params, k).sum()
                    return (r, acc), None

                (_, acc), _ = jax.lax.scan(body, (r, 0.0), None, length=reps)
                return acc

            med, spread = time_stats(run_many, eng_p.state.ema_params,
                                     jax.random.PRNGKey(0), n_warmup=1,
                                     n_iters=5)
            return max(med - floor, 1e-7) / reps, spread

        for tag, B, depth, dm, nh in (("", 50, 2, 320, 10),
                                      ("_b1_deep", 1, 12, 384, 6),
                                      ("_b4_deep", 4, 12, 384, 6)):
            eng_p = DDS(
                DiT1d(in_dim=17, emb_dim=128, d_model=dm, n_heads=nh,
                      depth=depth, timestep_emb_type="fourier"),
                diffusion_steps=20, rng=0)
            prior_p = jnp.zeros((B, 32, 17))
            eng_p.init(prior_p)
            seq_fn = eng_p.build_sample_fn(
                solver="ddim", sample_steps=20, cfg_mode="uncond",
                final_logp=False)
            par_fn = eng_p.build_parallel_sample_fn(
                sample_steps=20, picard_iters=6)
            t_seq, sp_seq = run_repeat(
                eng_p, lambda p, k: seq_fn(p, None, k, prior_p)[0], 20)
            t_par, sp_par = run_repeat(
                eng_p, lambda p, k: par_fn(p, k, prior_p)[0], 20)
            x_s = seq_fn(eng_p.state.ema_params, None,
                         jax.random.PRNGKey(1), prior_p)[0]
            x_p = par_fn(eng_p.state.ema_params, jax.random.PRNGKey(1),
                         prior_p)[0]
            dev = float(jnp.max(jnp.abs(x_p - x_s))
                        / jnp.maximum(jnp.max(jnp.abs(x_s)), 1e-6))
            out[f"picard_ddim{tag}_seq_ms"] = round(t_seq * 1e3, 3)
            out[f"picard_ddim{tag}_par6_ms"] = round(t_par * 1e3, 3)
            out[f"picard_ddim{tag}_latency_speedup"] = round(
                t_seq / t_par, 3)
            out[f"picard_ddim{tag}_spread_pct"] = round(
                100 * (sp_seq + sp_par), 1)
            out[f"picard_ddim{tag}_rel_deviation"] = round(dev, 4)
    except Exception as e:
        out["picard_bench_error"] = str(e)[:160]

    # --- image DP: fully on-device visuomotor eval (SDF render + ResNet18
    # encode + 5-step denoise + env step in ONE jitted rollout) ---
    try:
        from cleandiffuser_tpu.dataset import PushTImageDataset, generate_pusht_demos
        from cleandiffuser_tpu.env.pusht_jax import PushTImageEnvJax
        from cleandiffuser_tpu.pipelines.dp_image import DPImagePipeline

        rb_img = generate_pusht_demos(n_episodes=4, max_steps=40,
                                      with_images=True, image_size=96)
        ds_img = PushTImageDataset(rb_img, horizon=16, pad_before=1, pad_after=7)
        shape_meta = {"obs": {
            "image": {"shape": [3, 96, 96], "type": "rgb"},
            "agent_pos": {"shape": [2], "type": "low_dim"}}}
        pipe_img = DPImagePipeline(
            shape_meta=shape_meta, action_dim=2, horizon=16, obs_steps=2,
            action_steps=8, nn="chi_unet", diffusion="ddpm", sample_steps=5,
            crop_shape=(84, 84), rng=0)
        b = ds_img.sample_batch(jax.random.PRNGKey(0), 8)
        pipe_img.agent._ensure_init(
            b["action"], pipe_img._condition_of(b["obs"]))
        env_img = PushTImageEnvJax(render_size=96)
        E_img, T_img = 50, 296
        pipe_img.evaluate_on_device(env_img, ds_img.normalizer,
                                    num_envs=E_img, max_episode_steps=300)
        t0 = time.perf_counter()
        pipe_img.evaluate_on_device(env_img, ds_img.normalizer,
                                    num_envs=E_img, max_episode_steps=300)
        t_ev = max(time.perf_counter() - t0 - floor, 1e-7)
        out["dp_image_eval_env_steps_per_sec"] = round(E_img * T_img / t_ev, 1)
        out["dp_image_eval_s_per_50env_episode"] = round(t_ev, 3)
    except Exception as e:
        out["dp_image_bench_error"] = str(e)[:160]

    return out


def main():
    engine = build_engine()
    prior = jnp.zeros((BATCH, ACT_DIM))
    obs = jnp.asarray(np.random.randn(BATCH, OBS_DIM).astype(np.float32))
    engine.init(prior, obs)
    rng = jax.random.PRNGKey(0)

    REPEAT = 100

    # ---- fused scan sampler (ours): REPEAT chained calls in ONE program ----
    sample_fn = engine.build_sample_fn(
        solver="ddpm", sample_steps=SAMPLE_STEPS, cfg_mode="cond", final_logp=False
    )

    @jax.jit
    def run_fused_many(params, r):
        def body(carry, _):
            r, acc = carry
            r, k = jax.random.split(r)
            x, _ = sample_fn(params, None, k, prior, condition_cfg=obs, w_cfg=1.0)
            return (r, acc + x.sum()), None

        (_, acc), _ = jax.lax.scan(body, (r, 0.0), None, length=REPEAT)
        return acc

    floor = round_trip_floor()
    med_f, spread_f = time_stats(run_fused_many, engine.state.ema_params, rng)
    t_fused = (med_f - floor) / REPEAT

    # ---- reference-style per-step dispatch (baseline proxy) ----
    # one jitted program per denoise step, Python loop on host
    alphas = engine.alpha
    sigmas = engine.sigma
    sched = jnp.linspace(0, SAMPLE_STEPS - 1, SAMPLE_STEPS + 1).astype(jnp.int32)
    a_t, s_t = alphas[sched], sigmas[sched]
    stds = jnp.concatenate(
        [jnp.zeros((1,)), s_t[:-1] / s_t[1:] * jnp.sqrt(1 - (a_t[1:] / a_t[:-1]) ** 2)]
    )

    @jax.jit
    def one_step(params, xt, i, r):
        t = jnp.full((BATCH,), sched[i], dtype=jnp.int32)
        eps = engine.apply_diffusion(params, xt, t, obs)
        x = (a_t[i - 1] / a_t[i]) * (xt - s_t[i] * eps) + jnp.sqrt(
            jnp.maximum(s_t[i - 1] ** 2 - stds[i] ** 2, 0.0) + 1e-8
        ) * eps
        noise = jax.random.normal(r, xt.shape)
        return x + jnp.where(i > 1, stds[i], 0.0) * noise

    def run_dispatch_many(r):
        acc = jnp.zeros(())
        for _ in range(REPEAT):
            r, k0 = jax.random.split(r)
            xt = jax.random.normal(k0, prior.shape)
            for i in range(SAMPLE_STEPS, 0, -1):
                r, k = jax.random.split(r)
                xt = one_step(engine.state.ema_params, xt, jnp.asarray(i), k)
            acc = acc + xt.sum()
        return acc

    t_dispatch = (time_fn(run_dispatch_many, rng, n_warmup=1, n_iters=5) - floor) / REPEAT

    actions_per_sec = BATCH / t_fused
    denoise_steps_per_sec = BATCH * SAMPLE_STEPS / t_fused
    vs_baseline = t_dispatch / t_fused

    # ---- planner benches (BASELINE config #2): Diffuser JannerUNet (20-step,
    # 50 envs x 64 candidates) and DD DiT (20-step, 50 envs) ----
    from cleandiffuser_tpu.nn_diffusion import DiT1d, JannerUNet1d

    planner_detail = {}
    fl_dql, by_dql = cost_of(
        lambda p, r: sample_fn(p, None, r, prior, condition_cfg=obs,
                               w_cfg=1.0)[0].sum(),
        engine.state.ema_params, rng,
    )
    m = mfu_pct(fl_dql, t_fused)
    if m is not None:
        planner_detail["dql_sampling_mfu_pct"] = m
    r = roofline_pct(fl_dql, by_dql, t_fused)
    if r is not None:
        planner_detail["dql_sampling_roofline_pct"] = r
    try:
        planner_detail.update(extended_benches(floor))
    except Exception as e:
        planner_detail["extended_bench_error"] = str(e)[:200]
    try:
        planner_detail.update(
            bench_planner(
                "diffuser_janner_h32",
                JannerUNet1d(in_dim=23, model_dim=32, emb_dim=32, kernel_size=5),
                (32, 23), batch=50 * 64, steps=20, repeat=5, floor=floor,
            )
        )
        planner_detail.update(
            bench_planner(
                "diffuser_janner_h32_bf16",
                JannerUNet1d(in_dim=23, model_dim=32, emb_dim=32, kernel_size=5),
                (32, 23), batch=50 * 64, steps=20, repeat=5, floor=floor,
                bf16=True,
            )
        )
        planner_detail.update(
            bench_planner(
                "dd_dit_h32",
                DiT1d(in_dim=17, emb_dim=128, d_model=320, n_heads=10, depth=2,
                      timestep_emb_type="fourier"),
                (32, 17), batch=50, steps=20, repeat=20, floor=floor,
            )
        )
    except Exception as e:  # keep the primary metric robust
        planner_detail["planner_bench_error"] = str(e)[:200]

    # ---- peak sampling throughput: the eval config (50 envs x 50
    # candidates) is latency-bound at 0.12ms/batch; a 10x candidate pool
    # shows the chip's throughput ceiling ----
    try:
        BIG = 25_000
        prior_big = jnp.zeros((BIG, ACT_DIM))
        obs_big = jnp.asarray(np.random.randn(BIG, OBS_DIM).astype(np.float32))

        @jax.jit
        def run_big_many(params, r):
            def body(carry, _):
                r, acc = carry
                r, k = jax.random.split(r)
                x, _ = sample_fn(params, None, k, prior_big,
                                 condition_cfg=obs_big, w_cfg=1.0)
                return (r, acc + x.sum()), None

            (_, acc), _ = jax.lax.scan(body, (r, 0.0), None, length=20)
            return acc

        t_big = (time_fn(run_big_many, engine.state.ema_params, rng,
                         n_warmup=1, n_iters=5) - floor) / 20
        planner_detail["dql_peak_actions_per_sec"] = round(BIG / t_big, 1)
        planner_detail["dql_peak_batch"] = BIG
    except Exception as e:
        planner_detail["peak_bench_error"] = str(e)[:200]

    # ---- training throughput: fused DQL train step (critic TD + policy
    # backprop-through-sampling + EMA/Polyak in ONE donated XLA program) ----
    try:
        from cleandiffuser_tpu.dataset import D4RLMuJoCoTDDataset
        from cleandiffuser_tpu.dataset.fake import fake_d4rl_qlearning_dataset
        from cleandiffuser_tpu.pipelines import DQLPipeline

        ds = D4RLMuJoCoTDDataset(
            fake_d4rl_qlearning_dataset("halfcheetah-medium-v2", n_steps=20_000)
        )
        pipe = DQLPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim,
                           diffusion_steps=5, sampling_steps=5,
                           gradient_steps=1000, rng=0)
        batch = ds.sample_batch(jax.random.PRNGKey(1), 256)
        N_STEPS = 50
        pipe.train_step(batch)  # compile

        import time as _time

        # per-dispatch path: dominated by tunnel latency by design (the
        # fused-window number below is the production path); subtract the
        # measured round-trip of the single final fetch, not a guess
        blocks = []
        for _ in range(5):
            t0 = _time.time()
            for _ in range(N_STEPS):
                log = pipe.train_step(batch)
            _ = float(log["critic_loss"])  # force
            blocks.append(max((_time.time() - t0 - floor) / N_STEPS, 1e-7))
        blocks.sort()
        t_train = blocks[len(blocks) // 2]
        planner_detail["dql_train_steps_per_sec"] = round(1.0 / t_train, 1)
        planner_detail["dql_train_ms_per_step"] = round(t_train * 1e3, 3)
        planner_detail["dql_train_spread_pct"] = round(
            100 * (blocks[-1] - blocks[0]) / t_train, 1)

        # fused window: K train steps in ONE XLA program with the batch
        # gather inside the scan — the production train_loop amortization,
        # insensitive to tunnel dispatch latency (which inflates the
        # per-dispatch number above by up to ~5ms/step on a bad day)
        step_fn = pipe._make_train_step()
        K_WIN, B_TR = 200, 256
        # the dataset store is ref-backed (dataset/base.py): gather through
        # its pure gather_fn — jnp.take on the raw Refs is a type error
        gather = ds.gather_fn(B_TR)

        @jax.jit
        def run_window(actor_state, critic_state, r):
            def body(carry, _):
                a_st, c_st, r, acc = carry
                r, kb = jax.random.split(r)
                batch = gather(kb)
                a_st, c_st, log = step_fn(a_st, c_st, batch)
                # accumulate the loss so the whole step stays live (a
                # counter-only return lets XLA DCE the entire update)
                return (a_st, c_st, r, acc + log["critic_loss"]), None

            (a_st, c_st, _, acc), _ = jax.lax.scan(
                body, (actor_state, critic_state, r, 0.0), None, length=K_WIN)
            return acc

        # clamp: tiny fused programs can measure below the tunnel floor
        med_w, spread_w = time_stats(
            run_window, pipe.actor.state, pipe.critic_state,
            jax.random.PRNGKey(2), n_warmup=1, n_iters=5)
        t_win = max(med_w - floor, 1e-7) / K_WIN
        planner_detail["dql_train_fused_steps_per_sec"] = round(1.0 / t_win, 1)
        planner_detail["dql_train_fused_ms_per_step"] = round(t_win * 1e3, 3)
        planner_detail["dql_train_fused_spread_pct"] = round(
            100 * spread_w, 1)
    except Exception as e:
        planner_detail["train_bench_error"] = str(e)[:200]

    full = {
        "metric": "dql_sampled_actions_per_sec_per_chip",
        "value": round(actions_per_sec, 1),
        "unit": "actions/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "denoise_steps_per_sec": round(denoise_steps_per_sec, 1),
            "batch": BATCH,
            "sample_steps": SAMPLE_STEPS,
            "fused_ms": round(t_fused * 1e3, 3),
            "fused_spread_pct": round(100 * spread_f, 1),
            "per_step_dispatch_ms": round(t_dispatch * 1e3, 3),
            "device": str(jax.devices()[0]),
            **planner_detail,
        },
    }
    # full record to a file; the driver's stdout capture is ~2000 chars and
    # BENCH_r02-04 all came back `parsed: null` from one oversized line
    from pathlib import Path

    Path(__file__).resolve().parent.joinpath("BENCH_full.json").write_text(
        json.dumps(full, indent=1) + "\n")

    # compact headline LAST: curated keys, hard-capped under 1.5kB
    headline_keys = [
        "denoise_steps_per_sec", "fused_ms", "fused_spread_pct",
        "dql_train_fused_steps_per_sec", "dql_peak_actions_per_sec",
        "diffuser_janner_h32_plans_per_sec", "diffuser_janner_h32_mfu_pct",
        "dd_dit_sample_xla_ms_per_batch", "dd_dit_sample_pallas_ms_per_batch",
        "pallas_dit_block_speedup", "dd_dit_sample_pallas_mfu_pct",
        "dd_dit_sample_pallas_roofline_pct",
        "dp_chiunet_train_steps_per_sec", "dp_chiunet_train_bf16_speedup",
        "dp_chiunet_train_bf16_spread_pct",
        "picard_ddim_b1_deep_latency_speedup",
        "dp_eval_env_steps_per_sec", "dd_dit_train_steps_per_sec",
    ]
    detail = full["detail"]
    compact = {k: full[k] for k in ("metric", "value", "unit", "vs_baseline")}
    compact["detail"] = {k: detail[k] for k in headline_keys if k in detail}
    compact["full"] = "BENCH_full.json"
    line = json.dumps(compact)
    while len(line) > 1500 and compact["detail"]:
        compact["detail"].popitem()
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
