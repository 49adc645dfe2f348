"""Component-level train-step timing on the real chip.

bench.py's ``train`` metric (B=16, T=1536, ~24.6k frames/step, the reference
token budget ``handler/base_config.yaml:79``) reports 69% MFU under the
shipped bf16 policy, counting ONLY denoiser matmul FLOPs x3. This tool
isolates where the non-MFU wall time goes — forward, backward, adamw update,
the f32->bf16 weight casts, the encoder/glue — with bench.py's chained
fori_loop two-K methodology, so "the other 31%" is attributable instead of
folklore.

    python tools/profile_train.py [--parts full fwd fwd_bwd sgd opt cast \
                                   denoiser_fwd denoiser_fwd_bwd] \
                                  [--precision default f32]

Parts (all at the bench train shapes):
  full              the shipped train step: fwd + bwd + adamw (== bench)
  fwd               loss forward only
  fwd_bwd / sgd     value_and_grad consumed by a 0-lr SGD carry (no adamw);
                    full - sgd isolates the adamw update + state traffic
  opt               adamw update alone against fixed grads
  cast              one f32->bf16 cast of the full param tree (the per-step
                    policy overhead's upper bound; XLA usually fuses it)
  denoiser_fwd      WaveNet(train=True) forward alone at [B,T,256]
  denoiser_fwd_bwd  ...and its backward (sgd-consumed); fwd_bwd - this
                    approximates encoder + diffusion glue + loss
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

B, T_PH, T_MEL, N_MELS = 16, 32, 1536, 128


def measure(fn_builder, label):
    dt = bench._measure(fn_builder)
    print(f"{label:40s} {dt * 1000:8.3f} ms")
    return dt


def _setup(precision):
    import optax

    from __graft_entry__ import _example_inputs, _flagship
    from prodiff_tpu.models.prodiff import ProDiffTeacher, resolve_train_bf16

    rng = np.random.default_rng(3)
    _, hp = _flagship(n_mels=N_MELS)
    hp = dict(hp, bf16=False) if precision == "f32" else resolve_train_bf16(hp)
    model = ProDiffTeacher(vocab_size=64, hparams=hp)
    tokens, mel2ph, f0, lang, spk, mel = _example_inputs(
        rng, B, T_PH, T_MEL, N_MELS
    )
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk, gt_spec=mel,
    )
    tx = optax.adamw(1e-4, b1=0.9, b2=0.98)
    opt_state = jax.jit(tx.init)(params["params"])

    def loss_fn(variables, rng_key):
        x0_pred, x0 = model.apply(
            variables, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
            gt_spec=mel, deterministic=False,
            rngs={"diffusion": rng_key,
                  "dropout": jax.random.fold_in(rng_key, 1)},
        )
        return jnp.mean(jnp.abs(x0_pred - x0))

    return model, hp, params, opt_state, tx, loss_fn


def _carry_chain(step, init_carry):
    """bench-style loop where the dependency chain is the carry itself."""

    def make_loop(K):
        @jax.jit
        def run_c(c):
            def body(i, carry_loss):
                carry, _ = carry_loss
                return step(carry, jax.random.fold_in(jax.random.PRNGKey(9), i))

            _, loss = jax.lax.fori_loop(0, K, body, (c, jnp.float32(0)))
            return loss

        return lambda: run_c(init_carry)

    return make_loop


def part_full(precision):
    import optax

    _, _, params, opt_state, tx, loss_fn = _setup(precision)

    def step(carry, rng_key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, rng_key)
        updates, opt_state = tx.update(
            grads["params"], opt_state, params["params"]
        )
        params = {"params": optax.apply_updates(params["params"], updates)}
        return (params, opt_state), loss

    return _carry_chain(step, (params, opt_state))


def part_fwd(precision):
    _, _, params, _, _, loss_fn = _setup(precision)

    def step(carry, rng_key):
        (params,) = carry
        loss = loss_fn(params, rng_key)
        # keep the chain through params without changing them materially
        params = jax.tree.map(lambda p: p * (1.0 + 0.0 * loss), params)
        return (params,), loss

    return _carry_chain(step, (params,))


def part_sgd(precision):
    _, _, params, _, _, loss_fn = _setup(precision)

    def step(carry, rng_key):
        (params,) = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, rng_key)
        params = jax.tree.map(lambda p, g: p - 1e-30 * g, params, grads)
        return (params,), loss

    return _carry_chain(step, (params,))


def part_opt(precision):
    import optax

    _, _, params, opt_state, tx, loss_fn = _setup(precision)
    grads = jax.jit(jax.grad(loss_fn))(params, jax.random.PRNGKey(2))

    def step(carry, rng_key):
        params, opt_state = carry
        jitter = jax.random.uniform(rng_key, ()) * 1e-30
        g = jax.tree.map(lambda x: x + jitter, grads["params"])
        updates, opt_state = tx.update(g, opt_state, params["params"])
        params = {"params": optax.apply_updates(params["params"], updates)}
        return (params, opt_state), jax.tree.leaves(updates)[0].ravel()[0]

    return _carry_chain(step, (params, opt_state))


def part_cast(precision):
    _, _, params, _, _, _ = _setup(precision)

    def compute(rng_key, eps, c):
        casted = jax.tree.map(
            lambda p: (p + eps).astype(jnp.bfloat16), c["params"]
        )
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(casted))

    return bench._chain(compute, jax.random.PRNGKey(0), consts=params)


def _denoiser(precision):
    from prodiff_tpu.models.prodiff import resolve_train_bf16
    from prodiff_tpu.models.wavenet import WaveNet

    from __graft_entry__ import _flagship

    _, hp = _flagship(n_mels=N_MELS)
    hp = dict(hp, bf16=False) if precision == "f32" else resolve_train_bf16(hp)
    dtype = jnp.bfloat16 if hp.get("bf16") else None
    net = WaveNet(in_dims=N_MELS, hidden_size=256, residual_layers=20,
                  residual_channels=256, dtype=dtype)
    rng = np.random.default_rng(5)
    spec = jnp.asarray(rng.normal(size=(B, T_MEL, N_MELS)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, T_MEL, 256)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 4, size=(B,)).astype(np.int32))
    params = jax.jit(lambda: net.init(jax.random.PRNGKey(0), spec, t, cond,
                                      train=True))()
    return net, params, spec, cond, t


def part_denoiser_fwd(precision):
    net, params, spec, cond, t = _denoiser(precision)

    def step(carry, rng_key):
        (params,) = carry
        out = net.apply(params, spec, t, cond, train=True)
        loss = jnp.mean(jnp.abs(out))
        params = jax.tree.map(lambda p: p * (1.0 + 0.0 * loss), params)
        return (params,), loss

    return _carry_chain(step, (params,))


def part_denoiser_fwd_bwd(precision):
    net, params, spec, cond, t = _denoiser(precision)

    def loss_fn(params, rng_key):
        out = net.apply(params, spec, t, cond, train=True)
        return jnp.mean(jnp.abs(out))

    def step(carry, rng_key):
        (params,) = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, rng_key)
        params = jax.tree.map(lambda p, g: p - 1e-30 * g, params, grads)
        return (params,), loss

    return _carry_chain(step, (params,))


PARTS = {
    "full": part_full,
    "fwd": part_fwd,
    "fwd_bwd": part_sgd,
    "sgd": part_sgd,
    "opt": part_opt,
    "cast": part_cast,
    "denoiser_fwd": part_denoiser_fwd,
    "denoiser_fwd_bwd": part_denoiser_fwd_bwd,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", nargs="*", default=list(dict.fromkeys(PARTS)))
    ap.add_argument("--precision", nargs="*", default=["default"],
                    choices=["default", "f32"])
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: shrink shapes so every part "
                    "compiles+runs in seconds (numbers meaningless)")
    args = ap.parse_args()
    if args.tiny:
        global B, T_PH, T_MEL
        B, T_PH, T_MEL = 2, 8, 64

    try:
        from prodiff_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass

    print(f"platform={jax.devices()[0].platform} "
          f"B={B} T_mel={T_MEL} n_mels={N_MELS}")
    for precision in args.precision:
        for name in args.parts:
            measure(PARTS[name](precision), f"{name} [{precision}]")


if __name__ == "__main__":
    main()
