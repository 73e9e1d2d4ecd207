"""Measure WHY cast-based bf16 'mixed precision' loses on TPU.

Hypothesis (XLA semantics): with the default matmul precision, an f32
matmul on TPU already executes on the MXU as a single bfloat16 pass
(precision=DEFAULT). Explicitly casting params/activations to bf16 then
adds pure conversion traffic with zero MXU speedup — which would explain
BENCH_r03's dp_chiunet_train_bf16_speedup = 0.579.

Experiments (one real chip, fused in lax.scan to amortize the tunnel):
1. big matmul: f32-default vs f32-HIGHEST (3-pass) vs explicit bf16.
   If f32-default ~= bf16 and f32-HIGHEST is ~3x slower, the hypothesis
   holds: there is no FLOP win left for casting to claim.
2. ChiUNet + DiT train step: f32 vs bf16_training at the benched shapes,
   to attribute the residual delta to cast overhead.

MEASURED (TPU v5e via axon, 2026-08-19 — hypothesis CONFIRMED):
  matmul 4096^2 x32 chained:  f32-default 77.9 ms / 56.5 TFLOP/s
                              explicit bf16 85.5 ms / 51.5 TFLOP/s
                              f32-HIGHEST 200.1 ms / 22.0 TFLOP/s
  DiT train step: f32 7.60 ms vs bf16_training 8.63 ms (0.88x)
=> On TPU, default-precision f32 matmuls ALREADY run the MXU as bf16
   multiply passes with f32 accumulation (that's why HIGHEST, which uses
   3 passes for full f32 product precision, is ~2.6x slower). Cast-based
   AMP has no FLOP win left to claim and pays pure conversion traffic.
   bf16_training / bf16_sampling stay available (HBM-capacity relief)
   but OFF by default, and the README no longer sells them as a speedup.

Usage: python tools/bench_bf16_analysis.py [--repeat 50]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, repeat=3):
    fn(*args)  # compile
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        # force through the tunnel with a scalar fetch
        jax.block_until_ready(out)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(
            jnp.float32) * 0 + 1.0)
        best = min(best, time.perf_counter() - t0)
    return best


def matmul_modes(n=4096, steps=32, repeat=5):
    """Chained matmuls (scan) so one dispatch covers `steps` MXU calls."""
    a32 = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)),
                      jnp.float32)
    b32 = jnp.asarray(np.random.default_rng(1).normal(size=(n, n)),
                      jnp.float32)

    results = {}
    flops = 2 * n**3 * steps

    def chain(a, b, precision):
        def body(c, _):
            c = jax.lax.dot_general(
                c, b, (((1,), (0,)), ((), ())), precision=precision)
            return c / jnp.sqrt(jnp.float32(n)).astype(c.dtype), None
        out, _ = jax.lax.scan(body, a, None, length=steps)
        return out

    for name, args in (
        ("f32_default", (a32, b32, None)),
        ("f32_highest", (a32, b32, jax.lax.Precision.HIGHEST)),
        ("bf16", (a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16), None)),
    ):
        fn = jax.jit(lambda a, b, p=args[2]: chain(a, b, p))
        dt = timed(fn, args[0], args[1], repeat=repeat)
        results[name] = dict(ms=dt * 1e3, tflops=flops / dt / 1e12)
    return results


def train_step_modes(repeat=5, batch=64, depth=12, d_model=384, H=32):
    """DiT1d fused train window, f32 vs bf16_training (the MXU-heavy case
    VERDICT r3 item 5 asks about)."""
    from cleandiffuser_tpu.diffusion import ContinuousDiffusionSDE
    from cleandiffuser_tpu.nn_condition import MLPCondition
    from cleandiffuser_tpu.nn_diffusion import DiT1d

    out = {}
    rng = np.random.default_rng(0)
    B, D = batch, 14
    x0 = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    for mode in ("f32", "bf16"):
        eng = ContinuousDiffusionSDE(
            DiT1d(D, emb_dim=d_model, d_model=d_model,
                  n_heads=max(1, d_model // 64), depth=depth),
            nn_condition=MLPCondition(D, d_model, [256]),
            ema_rate=0.995, rng=0)
        eng.bf16_training = mode == "bf16"
        eng.init(x0[:2], cond[:2])
        upd = eng._make_update_fn(update_ema=True, has_wrt=False)

        def window(state, x0, cond, n=8):
            def body(s, _):
                s, info = upd(s, x0, cond, None)
                return s, info["loss"]
            return jax.lax.scan(body, state, None, length=n)

        wfn = jax.jit(window, donate_argnums=0)
        state, _ = wfn(eng.state, x0, cond)   # compile
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            state, loss = wfn(state, x0, cond)
            float(loss[-1])
            best = min(best, time.perf_counter() - t0)
        out[f"dit_{mode}_ms_per_step"] = best * 1e3 / 8
    out["dit_bf16_speedup"] = (out["dit_f32_ms_per_step"]
                               / out["dit_bf16_ms_per_step"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    print("[bf16] devices:", jax.devices(), flush=True)
    mm = matmul_modes(repeat=args.repeat)
    for k, v in mm.items():
        print(f"[bf16] matmul {k}: {v['ms']:.2f} ms, {v['tflops']:.1f} "
              "TFLOP/s", flush=True)
    if not args.skip_train:
        ts = train_step_modes(repeat=args.repeat)
        for k, v in ts.items():
            print(f"[bf16] {k}: {v:.3f}", flush=True)


if __name__ == "__main__":
    main()
