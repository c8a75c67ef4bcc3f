"""World-model wrapper: online joint finetuning of tokenizer + transformer,
and batched imagination rollouts for MBPO.

Rebuild of reference mbrl/video_predictor.py:102-347. The structural upgrade:
the reference's rollout loops frames on the host — one HF ``generate`` call,
one incremental detokenize, and one policy query per imagined step
(video_predictor.py:293-321). Here the WHOLE horizon — token sampling with
KV cache, per-frame detokenization with cached context features, frame-stack
update, and the DrQ-v2 policy query — is one jitted ``lax.scan``: zero host
round-trips per imagined step.

Reward is read from the hidden state after the frame's last dynamics token
(reference :298-313), trained with MSE on symlog rewards (reference :94-99,
:246).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu import generation
from ivideogpt_tpu import tokens as token_lib
from ivideogpt_tpu.configs import (ActionModelConfig, CompressiveVQConfig,
                                   TransformerConfig)
from ivideogpt_tpu.generation import sample_top_k
from ivideogpt_tpu.models.action_model import HeadModelWithAction
from ivideogpt_tpu.models.lpips import LPIPS
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.train.optim import TrainState, make_optimizer


def symlog(x):
    return jnp.sign(x) * jnp.log(jnp.abs(x) + 1.0)


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


class RolloutResult(NamedTuple):
    """Raw device outputs of the jitted rollout (new frames only — the
    stacked observation view is rebuilt host-side in rollout())."""
    frames: jnp.ndarray        # [B, H, h, w, 3] uint8 imagined frames
    actions: jnp.ndarray       # [B, H+1, A]
    rewards: jnp.ndarray       # [B, H+1]


class PendingRollout:
    """In-flight rollout: the device is executing; fetch() collects.

    Fetch order: block FIRST, then everything in one device_get —
    np.asarray on a still-executing array sits in a polling backoff on
    tunneled attachments (~300ms wasted per rollout, measured round 3)."""

    def __init__(self, res: RolloutResult, obs_np: np.ndarray):
        self._res = res
        self._obs = obs_np

    def fetch(self):
        res = self._res
        jax.block_until_ready(res)
        frames, actions, rewards = jax.device_get(
            (res.frames, res.actions, res.rewards))
        # frames: [B, H, h, w, 3] uint8. Rebuild the stacked observation
        # view host-side (cheap memcpy; the device ships only the
        # non-overlapping new pixels).
        obs = self._obs
        B, H = frames.shape[:2]
        k3 = obs.shape[-1]  # 3 * frame_stack channels
        obss = np.empty((B, H + 1, *obs.shape[1:3], k3), np.uint8)
        obss[:, 0] = np.clip(np.round(obs.astype(np.float32)),
                             0, 255).astype(np.uint8)
        for t in range(H):
            obss[:, t + 1, ..., :k3 - 3] = obss[:, t, ..., 3:]
            obss[:, t + 1, ..., k3 - 3:] = frames[:, t]
        return (obss, actions, rewards)


class VideoPredictor:
    """Owns tokenizer + action-conditioned LM states; provides
    train / rollout / rollout_async / save_snapshot (reference
    VideoPredictor:102-347)."""

    def __init__(self, tok_cfg: CompressiveVQConfig,
                 lm_cfg: TransformerConfig, head_cfg: ActionModelConfig, *,
                 tok_lr: float = 1e-4, model_lr: float = 1e-4,
                 tok_wd: float = 0.0, model_wd: float = 0.0,
                 reward_weight: float = 1.0, use_symlog: bool = True,
                 max_grad_norm: float = 1.0, freeze_codebook: bool = False,
                 max_target_frames: int = 16, seed: int = 0,
                 tok_params=None, lm_params=None, llm_params=None,
                 compute_dtype=jnp.bfloat16,
                 rollout_cache_dtype=jnp.int8):
        assert head_cfg.reward_prediction
        self.tok_cfg, self.lm_cfg, self.head_cfg = tok_cfg, lm_cfg, head_cfg
        self.reward_weight = reward_weight
        self.use_symlog = use_symlog
        self.max_target_frames = max_target_frames
        self.ctx = head_cfg.context_length
        self.compute_dtype = compute_dtype
        # imagination KV-cache dtype: int8 measures 2.71 vs bf16's 3.78
        # ms/token-step at gen_batch 32 (28% faster decode; quality bounds
        # in tools/kv_divergence_study.py); bf16 available for exact parity
        self.rollout_cache_dtype = rollout_cache_dtype

        # bf16 compute with fp32 master params = the reference's
        # torch.cuda.amp.autocast(bf16) world-model regime
        # (reference video_predictor.py:126,150); VQ distances stay fp32
        # inside ops/vq.py either way
        self.tokenizer = CompressiveVQModel(tok_cfg, dtype=compute_dtype)
        self.model = HeadModelWithAction(lm_cfg, head_cfg,
                                         dtype=compute_dtype)
        self.lpips = LPIPS(dtype=compute_dtype)

        rng = jax.random.key(seed)
        k1, k2, k3 = jax.random.split(rng, 3)
        if tok_params is None:
            H = tok_cfg.resolution
            dummy_ctx = jnp.zeros((1 * self.ctx, H, H, 3), jnp.float32)
            dummy_fut = jnp.zeros((1, H, H, 3), jnp.float32)
            tok_params = jax.jit(
                self.tokenizer.init, static_argnames="segment_len")(
                k1, dummy_ctx, dummy_fut, segment_len=1)
        L = token_lib.seq_len(self.ctx, head_cfg.segment_length,
                              ctx_tokens=tok_cfg.ctx_tokens_per_frame,
                              dyn_tokens=tok_cfg.dyn_tokens_per_frame)
        if lm_params is None:
            ids = jnp.zeros((1, L), jnp.int32)
            act = jnp.zeros((1, head_cfg.segment_length, head_cfg.action_dim),
                            jnp.float32)
            lm_params = jax.jit(self.model.init)(k2, ids, ids, act)
            if llm_params is not None:
                # load_internal_llm: pretrained transformer into the llm
                # subtree, heads stay fresh-init (reference
                # video_predictor.py:84-87, mbpo_config.yaml:74-80)
                lm_params = {
                    "params": {**lm_params["params"],
                               "llm": llm_params["params"]}}
        else:
            assert llm_params is None, \
                "pass either full lm_params or llm_params, not both"
        self.lpips_params = self.lpips.init(
            k3, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))

        # frozen-codebook option (reference :115-118 selected_params)
        if freeze_codebook:
            frozen = {"codebook", "dyn_codebook"}
        else:
            frozen = set()

        def tok_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: str(getattr(p[-1], "key", "")) not in frozen,
                params)

        import optax
        tok_tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.masked(optax.adamw(tok_lr, weight_decay=tok_wd),
                         tok_mask(tok_params)))
        model_tx, _ = make_optimizer(
            lm_params, learning_rate=model_lr, lr_scheduler="constant",
            warmup_steps=0, total_steps=10**9, weight_decay=model_wd,
            embed_no_wd=True, max_grad_norm=max_grad_norm)

        self.tok_state = TrainState.create(tok_params, tok_tx)
        self.model_state = TrainState.create(lm_params, model_tx)

        self._tok_step = self._make_tok_step()
        self._model_step = self._make_model_step()
        self._rollout_cache = {}

    # ------------------------------------------------------------------
    # online finetuning (reference :152-265)
    # ------------------------------------------------------------------

    def _make_tok_step(self):
        tokenizer, lpips, lpips_params = self.tokenizer, self.lpips, self.lpips_params
        ctx = self.ctx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, obs, target_idx):
            """target_idx: [num_target] frame indices into the future frames
            (random subset when capped, reference video_predictor.py:179-183)."""
            B, T = obs.shape[:2]
            ref = obs[:, :ctx].reshape(-1, *obs.shape[2:])
            target = jnp.take(obs[:, ctx:], target_idx, axis=1)
            target = target.reshape(-1, *obs.shape[2:])
            num_target = target_idx.shape[0]

            def loss_fn(params):
                dec, ref_dec, commit, dyn_commit = tokenizer.apply(
                    params, ref, target, num_target)
                recon = jnp.mean(jnp.abs(target - dec))
                ref_recon = jnp.mean(jnp.abs(ref - ref_dec))
                perc = jnp.mean(lpips.apply(
                    jax.lax.stop_gradient(lpips_params),
                    target * 2 - 1, dec * 2 - 1))
                ref_perc = jnp.mean(lpips.apply(
                    jax.lax.stop_gradient(lpips_params),
                    ref * 2 - 1, ref_dec * 2 - 1))
                loss = recon + ref_recon + perc + ref_perc + commit + dyn_commit
                return loss, {"tokenizer_loss": loss, "recon_loss": recon,
                              "ref_recon_loss": ref_recon,
                              "perceptual_loss": perc,
                              "ref_perceptual_loss": ref_perc,
                              "commit_loss": commit,
                              "dyna_commit_loss": dyn_commit}

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return state.apply_gradients(grads), metrics

        return step

    def _make_model_step(self):
        tokenizer, model, ctx = self.tokenizer, self.model, self.ctx
        reward_weight = self.reward_weight

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, tok_params, obs, action, reward):
            ids, labels = tokenizer.apply(
                jax.lax.stop_gradient(tok_params), obs, ctx,
                method=tokenizer.tokenize)

            def loss_fn(params):
                out = model.apply(params, ids, labels, action)
                ce = out["loss"]
                # target slice reward[:, ctx:] mirrors the reference
                # (video_predictor.py:243 + replay_buffer.py:217-219):
                # the head after frame t's last token is trained on the
                # reward of the transition LEAVING frame t — a one-step
                # convention the imagined buffer inherits; kept for parity
                r_loss = jnp.mean(jnp.square(out["reward_pred"]
                                             - reward[:, ctx:]))
                loss = ce + reward_weight * r_loss
                return loss, {"ce_loss": ce, "reward_loss": r_loss,
                              "model_loss": loss,
                              "model_train/reward_mean": jnp.mean(reward[:, ctx:]),
                              "model_train/reward_pred_mean":
                                  jnp.mean(out["reward_pred"])}

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return state.apply_gradients(grads), metrics

        return step

    def train(self, batch, update_tokenizer: bool = True,
              update_model: bool = True):
        """batch = (obs [B,T,h,w,3] uint8-scale, action [B,T,A], reward [B,T])
        (reference :152-167)."""
        start = time.time()
        obs, action, reward = batch
        obs = jnp.asarray(obs, jnp.float32) / 255.0
        action = jnp.asarray(action, jnp.float32)
        reward = jnp.asarray(reward, jnp.float32)
        if reward.ndim == 3:
            # segment-buffer rewards carry the dm_env trailing singleton
            # ([B,T,1]); the reward loss compares against reward_pred [B,F]
            # — without this squeeze the subtraction mis-broadcasts (or
            # errors whenever B != F)
            reward = reward[..., 0]
        if self.use_symlog:
            reward = symlog(reward)

        metrics = {}
        if update_tokenizer:
            T = obs.shape[1]
            n_future = T - self.ctx
            num_target = min(n_future, self.max_target_frames)
            if num_target < n_future:
                idx = np.sort(np.random.permutation(n_future)[:num_target])
            else:
                idx = np.arange(n_future)
            self.tok_state, m = self._tok_step(self.tok_state, obs,
                                               jnp.asarray(idx))
            metrics.update({k: float(v) for k, v in m.items()})
        if update_model:
            self.model_state, m = self._model_step(
                self.model_state, self.tok_state.params, obs, action, reward)
            metrics.update({k: float(v) for k, v in m.items()})
        metrics["model_update_time"] = time.time() - start
        return metrics

    # ------------------------------------------------------------------
    # imagination rollout (reference :267-339), fully on device
    # ------------------------------------------------------------------

    def _build_rollout(self, policy_fn, horizon: int, frame_stack: int,
                       replay_actions: bool = False):
        tokenizer, model = self.tokenizer, self.model
        hc, tc = self.head_cfg, self.tok_cfg
        ctx = self.ctx
        n_dyn = tc.dyn_tokens_per_frame
        n_ctx_tok = tc.ctx_tokens_per_frame
        sdf = self.lm_cfg.vocab_size - 1
        P1 = (n_ctx_tok + 1) * ctx  # prelude + first sdf

        @jax.jit
        def rollout(tok_params, lm_params, agent_state, obs, rng,
                    policy_stddev, expl_uniform, actions_seq):
            """obs: [B, h, w, 3*frame_stack] float in [0, 255]."""
            B = obs.shape[0]
            if self.compute_dtype != jnp.float32:
                # cast matmul weights once per rollout (bit-identical for a
                # bf16-compute model; the token scan otherwise re-reads the
                # fp32 masters every imagined token). 2-D tokenizer params
                # (VQ codebooks) stay fp32 for exact lookups.
                cd = self.compute_dtype
                lm_params = generation.cast_matmul_params(lm_params, cd)
                tok_params = generation.cast_conv_params(tok_params, cd)
            obs01 = obs / 255.0
            h_img = obs.shape[1]
            # split the stack into frames: last `ctx` are the context
            frames = obs01.reshape(B, h_img, h_img, frame_stack, 3)
            ctx_frames = jnp.moveaxis(frames, 3, 1)[:, -ctx:]  # [B,ctx,h,w,3]

            def t_apply(method, *args):
                return tokenizer.apply(tok_params, *args,
                                       method=getattr(tokenizer, method))

            def m_apply(method, *args):
                return model.apply(lm_params, *args,
                                   method=getattr(model, method))

            # context encode + decode cache
            idx_c = t_apply("encode_context", ctx_frames)
            _, dec_cache = t_apply("build_decode_cache", idx_c)

            # context token stream (no trailing sdf: each frame step decodes
            # its own sdf so the scan carry stays fixed-shape)
            scf_col = jnp.full((B, ctx, 1), tc.scf_token, jnp.int32)
            stream_c = jnp.concatenate([scf_col, idx_c], 2).reshape(B, -1)[:, 1:]

            # KV cache sized for the whole horizon
            total = P1 + (n_dyn + 1) * horizon
            cache = m_apply("init_cache", B, total, self.rollout_cache_dtype)
            embeds = m_apply("embed_tokens", stream_c)
            _, cache = m_apply("decode_cached", embeds, cache, 0)
            sdf_emb_base = m_apply("embed_tokens",
                                   jnp.full((B, 1), sdf, jnp.int32))

            # all step keys pre-split outside the scans: an in-loop
            # jax.random.split costs a threefry launch per imagined token,
            # pure per-step overhead at small batch (same rule as
            # generation.generate)
            all_keys = jax.random.split(
                rng, horizon * (n_dyn + 1)).reshape(horizon, n_dyn + 1)

            def frame_step(carry, xs):
                t, fkeys = xs
                cache, pos, stack = carry

                if replay_actions:
                    # validate(): replay recorded actions
                    # (reference train_metaworld_mbpo.py:219)
                    action = jax.lax.dynamic_index_in_dim(
                        actions_seq, t, axis=1, keepdims=False)
                else:
                    action = policy_fn(agent_state, stack * 255.0,
                                       policy_stddev, fkeys[0])
                    # init-gen exploration: before num_expl_steps the
                    # reference's act2 replaces the policy sample with
                    # uniform(-1, 1) (reference drqv2.py:188-198, used for
                    # "random action for init gen",
                    # train_metaworld_mbpo.py:175). Traced flag -> one
                    # compiled program for both regimes.
                    u = jax.random.uniform(
                        jax.random.fold_in(fkeys[0], 7), action.shape,
                        action.dtype, minval=-1.0, maxval=1.0)
                    action = jnp.where(expl_uniform, u, action)
                a_embed = m_apply("action_embeds", action)
                # this frame's sdf token with the action injected
                # (reference video_predictor.py:293-297)
                sdf_in = sdf_emb_base + a_embed[:, None, :].astype(
                    sdf_emb_base.dtype)
                hidden, cache = m_apply("decode_cached", sdf_in, cache, pos)
                logits = m_apply("unembed", hidden[:, -1, :])
                pos = pos + 1

                def token_step(c, kk):
                    cache, logits, pos = c
                    # bf16 unembed -> bf16-exact logits: 16-pass search
                    tok = sample_top_k(
                        kk, logits, 100, 1.0,
                        bf16_exact=self.compute_dtype == jnp.bfloat16)
                    emb = m_apply("embed_tokens", tok[:, None])
                    hidden, cache = m_apply("decode_cached", emb, cache, pos)
                    new_logits = m_apply("unembed", hidden[:, 0, :])
                    return (cache, new_logits, pos + 1), (tok, hidden[:, 0])

                (cache, logits, pos), (toks, hiddens) = jax.lax.scan(
                    token_step, (cache, logits, pos), fkeys[1:])
                # reward from hidden after the frame's last dyn token
                # (reference :298-313)
                reward = m_apply("reward", hiddens[-1])

                # decode the new frame with cached context features
                dyn_idx = jnp.clip(toks.T - tc.num_vq_embeddings, 0,
                                   tc.num_dyn_embeddings - 1)
                frame = t_apply("decode_dyn_frame", dyn_idx, dec_cache)
                frame = jnp.clip(frame, 0.0, 1.0)

                # roll the frame stack
                new_stack = jnp.concatenate([stack[..., 3:], frame], axis=-1)
                return ((cache, pos, new_stack),
                        (frame, action, reward))

            init = (cache, P1 - 1, obs01)
            _, (frames_out, actions, rewards) = jax.lax.scan(
                frame_step, init, (jnp.arange(horizon), all_keys))

            # Device->host payload is ONLY the new frames as uint8
            # ([B, H, h, w, 3]): the frame stacks overlap by (k-1)/k and the
            # episodes are stored uint8 anyway (mbpo.generate), so shipping
            # float32 stacks copied ~12x the necessary bytes — a large share
            # of rollout wall time at gen_batch 32 on tunneled attachments.
            # rollout() rebuilds the stacked [B, H+1, h, w, 3k] view on host.
            frames_u8 = jnp.clip(
                jnp.round(jnp.moveaxis(frames_out, 0, 1) * 255.0),
                0, 255).astype(jnp.uint8)
            acts = jnp.moveaxis(actions, 0, 1)
            rews = jnp.moveaxis(rewards, 0, 1)
            acts = jnp.concatenate([jnp.zeros_like(acts[:, :1]), acts], axis=1)
            rews = jnp.concatenate([jnp.zeros_like(rews[:, :1]), rews], axis=1)
            if self.use_symlog:
                rews = symexp(rews)
            return RolloutResult(frames_u8, acts, rews)

        return rollout

    def rollout_async(self, obs, policy_fn, agent_state, horizon: int,
                      frame_stack: int = 3, policy_stddev: float = 0.1,
                      rng=None, replay_actions=None,
                      expl_uniform: bool = False) -> "PendingRollout":
        """Dispatch a batched imagination rollout and return a handle.

        The device starts executing immediately; ``.fetch()`` on the handle
        blocks and returns ``(obss, actions, rewards)``. Dispatching the
        next rollout BEFORE fetching the previous one overlaps the ~200ms
        result transfer with the next rollout's execution (the transfer is
        the second-largest cost at gen_batch 32 on tunneled attachments;
        mbpo.generate() uses exactly this pipeline)."""
        use_replay = replay_actions is not None
        key = (None if use_replay else policy_fn, horizon, frame_stack,
               use_replay)
        if key not in self._rollout_cache:
            self._rollout_cache[key] = self._build_rollout(
                policy_fn, horizon, frame_stack, replay_actions=use_replay)
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31))
        if replay_actions is None:
            replay_actions = jnp.zeros(
                (obs.shape[0], horizon, self.head_cfg.action_dim), jnp.float32)
        res = self._rollout_cache[key](
            self.tok_state.params, self.model_state.params, agent_state,
            jnp.asarray(obs, jnp.float32), rng, policy_stddev,
            jnp.asarray(expl_uniform, jnp.bool_),
            jnp.asarray(replay_actions, jnp.float32))
        # np.array (copy): obs is often a small SLICE of a much larger
        # mixed batch — holding the view would keep the whole parent
        # array alive for the entire in-flight interval
        return PendingRollout(res, np.array(obs))

    def rollout(self, obs, policy_fn, agent_state, horizon: int,
                frame_stack: int = 3, policy_stddev: float = 0.1, rng=None,
                replay_actions=None, expl_uniform: bool = False):
        """Batched imagination: obs [B, h, w, 3*frame_stack] in [0, 255].

        policy_fn(agent_state, obs_stack_255, stddev, key) -> action [B, A]
        (the DrQ-v2 batched policy). Pass replay_actions [B, H, A] to roll
        out recorded actions instead (the validate() protocol)."""
        return self.rollout_async(
            obs, policy_fn, agent_state, horizon, frame_stack=frame_stack,
            policy_stddev=policy_stddev, rng=rng,
            replay_actions=replay_actions, expl_uniform=expl_uniform).fetch()

    # ------------------------------------------------------------------

    def save_snapshot(self, workdir: str, suffix: str = ""):
        """Orbax snapshot of both train states (reference :341-347)."""
        from ivideogpt_tpu.utils.checkpoint import save_train_state
        save_train_state(os.path.join(workdir, f"model{suffix}"), 0,
                         self.model_state)
        save_train_state(os.path.join(workdir, f"tokenizer{suffix}"), 0,
                         self.tok_state)

    def load_snapshot(self, workdir: str, suffix: str = ""):
        from ivideogpt_tpu.utils.checkpoint import (latest_checkpoint,
                                                    restore_train_state)
        self.model_state = restore_train_state(
            latest_checkpoint(os.path.join(workdir, f"model{suffix}")),
            self.model_state)
        self.tok_state = restore_train_state(
            latest_checkpoint(os.path.join(workdir, f"tokenizer{suffix}")),
            self.tok_state)
