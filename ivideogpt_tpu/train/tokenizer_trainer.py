"""Tokenizer (VQGAN) training: alternating generator/discriminator steps.

Rebuild of the reference alternating optimization (reference
train_tokenizer.py:583-800):
- generator loss: recon (L1/L2) + ref-recon + LPIPS(+ref) + commit losses,
  balanced by future/context frame fractions (--balanced_loss), + GAN gen
  loss scaled by the *adaptive weight* = |d perc/d conv_out W| / |d gan/d
  conv_out W| (reference :714-722)
- discriminator: hinge loss on real vs reconstructed frames, active after
  disc_start
- generator/discriminator alternate per accumulation window (reference :588)

TPU-first: each step is a single jitted function; the adaptive weight is
computed with two cheap targeted VJPs through ONLY the conv_out + loss heads
(using the captured pre-conv_out activation), instead of the reference's two
extra full-graph backward passes.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ivideogpt_tpu.configs import TokenizerTrainConfig
from ivideogpt_tpu.models.discriminator import gen_loss as adv_gen_loss
from ivideogpt_tpu.models.discriminator import hinge_d_loss
from ivideogpt_tpu.train.optim import (TrainState, global_norm,
                                        per_module_grad_norms)


def _recon_loss(gt, recon, kind: str):
    # fp32 reduction: under --mixed_precision bf16 the decoder emits bf16
    gt, recon = gt.astype(jnp.float32), recon.astype(jnp.float32)
    if kind == "l2":
        return jnp.mean(jnp.square(gt - recon))
    return jnp.mean(jnp.abs(gt - recon))


def _split_frames(pixels: jnp.ndarray, context_length: int):
    """[B, T, H, W, C] -> (context [B*ctx, ...], future [B*F, ...])."""
    B, T = pixels.shape[:2]
    rest = pixels.shape[2:]
    ctx = pixels[:, :context_length].reshape(B * context_length, *rest)
    fut = pixels[:, context_length:].reshape(B * (T - context_length), *rest)
    return ctx, fut


def _conv_out_tail(act, kernel, bias):
    """Recompute dec = conv_out(act) for targeted kernel gradients."""
    dec = jax.lax.conv_general_dilated(
        act.astype(kernel.dtype), kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return dec + bias


def make_generator_step(model, disc_model, lpips_model, lpips_params,
                        cfg: TokenizerTrainConfig, *, use_gan: bool):
    """Returns step(state, disc_vars, pixels, rng) -> (state, metrics)."""
    T, ctx = cfg.segment_length, cfg.context_length
    F = T - ctx
    w_fut = F / T if cfg.balanced_loss else 1.0
    w_ctx = ctx / T if cfg.balanced_loss else 1.0

    def lpips(a, b):
        return jnp.mean(lpips_model.apply(
            jax.lax.stop_gradient(lpips_params), a * 2.0 - 1.0,
            b * 2.0 - 1.0).astype(jnp.float32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, disc_vars, pixels, rng):
        ref_single, target = _split_frames(pixels, ctx)

        def loss_fn(params):
            dec, ref_dec, commit, dyn_commit, pre_out = model.apply(
                params, ref_single, target, F, deterministic=False,
                return_pre_out=True, rngs={"dropout": rng})

            recon = _recon_loss(target, dec, cfg.vae_loss)
            ref_recon = _recon_loss(ref_single, ref_dec, cfg.vae_loss)
            perc = lpips(target, dec)
            ref_perc = lpips(ref_single, ref_dec)

            loss = (cfg.recon_weight * (recon * w_fut + ref_recon * w_ctx)
                    + cfg.perc_weight * (perc * w_fut + ref_perc * w_ctx)
                    + commit + dyn_commit)

            metrics = {"recon_loss": recon, "ref_recon_loss": ref_recon,
                       "perceptual_loss": perc, "ref_perceptual_loss": ref_perc,
                       "commit_loss": commit, "dyn_commit_loss": dyn_commit}

            if use_gan:
                disc_fmap = jnp.concatenate([ref_dec, dec], axis=0)
                fake_logits = disc_model.apply(disc_vars, disc_fmap,
                                               update_stats=False)
                g_loss = adv_gen_loss(fake_logits.astype(jnp.float32))

                # adaptive weight: targeted VJPs through conv_out + heads only
                # (reference train_tokenizer.py:714-722)
                conv = params["params"]["cond_decoder"]["conv_out"]
                act = jax.lax.stop_gradient(pre_out)
                bias = jax.lax.stop_gradient(conv["bias"])
                n_total = disc_fmap.shape[0]

                def perc_tail(kernel):
                    dec2 = _conv_out_tail(act, kernel, bias)
                    return lpips(target, dec2)

                def gan_tail(kernel):
                    dec2 = _conv_out_tail(act, kernel, bias)
                    logits = disc_model.apply(disc_vars, dec2,
                                              update_stats=False)
                    # dec's share of the mean over the ref+dec concat batch
                    return -jnp.sum(jnp.mean(logits, axis=(1, 2, 3))) / n_total

                k = jax.lax.stop_gradient(conv["kernel"])
                g_perc = jax.grad(perc_tail)(k)
                g_gan = jax.grad(gan_tail)(k)
                adaptive = (jnp.linalg.norm(g_perc.reshape(-1))
                            / jnp.clip(jnp.linalg.norm(g_gan.reshape(-1)),
                                       1e-8))
                adaptive = jax.lax.stop_gradient(jnp.clip(adaptive, None, 1e4))
                loss = loss + cfg.disc_weight * adaptive * g_loss
                metrics["gan_loss"] = g_loss
                metrics["adaptive_weight"] = adaptive

            metrics["gen_loss"] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        metrics["grad_norm"] = global_norm(grads)
        # tiny per-submodule scalars; the driver logs them every
        # log_grad_norm_steps (reference train_tokenizer.py:747-748)
        metrics.update(per_module_grad_norms(grads["params"]))
        state = state.apply_gradients(grads)
        return state, metrics

    return step


def make_discriminator_step(model, disc_model, cfg: TokenizerTrainConfig):
    """Returns step(disc_state, disc_stats, gen_params, pixels, rng)."""
    T, ctx = cfg.segment_length, cfg.context_length
    F = T - ctx

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(disc_state: TrainState, disc_stats, gen_params, pixels, rng):
        ref_single, target = _split_frames(pixels, ctx)
        dec, ref_dec, _, _ = model.apply(
            jax.lax.stop_gradient(gen_params), ref_single, target, F,
            deterministic=False, rngs={"dropout": rng})
        real = jnp.concatenate([ref_single, target], axis=0)
        fake = jax.lax.stop_gradient(jnp.concatenate([ref_dec, dec], axis=0))

        def loss_fn(params):
            variables = {"params": params, **disc_stats}
            real_logits, vs1 = disc_model.apply(
                variables, real, update_stats=True, mutable=["batch_stats"])
            fake_logits, vs2 = disc_model.apply(
                variables, fake, update_stats=True, mutable=["batch_stats"])
            loss = hinge_d_loss(real_logits.astype(jnp.float32),
                                fake_logits.astype(jnp.float32))
            return loss, (vs2, jnp.mean(real_logits), jnp.mean(fake_logits))

        (loss, (new_stats, real_m, fake_m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(disc_state.params)
        gnorm = global_norm(grads)
        disc_state = disc_state.apply_gradients(grads)
        return disc_state, new_stats, {
            "discr_loss": loss, "real_logits": real_m, "fake_logits": fake_m,
            "disc_grad_norm": gnorm}

    return step


def make_eval_step(model, lpips_model, lpips_params, cfg: TokenizerTrainConfig):
    T, ctx = cfg.segment_length, cfg.context_length
    F = T - ctx

    @jax.jit
    def step(params, pixels):
        ref_single, target = _split_frames(pixels, ctx)
        dec, ref_dec, commit, dyn_commit = model.apply(
            params, ref_single, target, F, deterministic=True)
        recon = _recon_loss(target, dec, cfg.vae_loss)
        perc = jnp.mean(lpips_model.apply(
            lpips_params, target * 2.0 - 1.0, dec * 2.0 - 1.0))
        return {"eval_recon_loss": recon, "eval_perceptual_loss": perc,
                "eval_commit_loss": commit}, dec, ref_dec
    return step
