"""VP2 visual-planning interface: batch predictor callable for CEM planners.

Rebuild of reference vp/ivideogpt_interface.py:100-206: takes
``{"video": [B, 2, H, W, C] context frames, "actions": [B, T, A]}``, returns
``{"rgb": [B, 11, 64, 64, 3]}`` future-frame predictions. Fixed
ctx=2 / seg=12 contract (reference :151-152).

TPU-first: no host chunking loops needed — the jitted generator handles the
full CEM population in one device program; an optional ``max_batch`` still
chunks for memory parity with the reference knobs
(generate_max_batchsize/decode_max_batchsize, reference :183-203).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class IVideoGPTPredictor:
    num_context = 2
    base_prediction_modality = "rgb"

    def __init__(self, tokenizer, tok_params, model, lm_params, *,
                 context_length: int = 2, segment_length: int = 12,
                 max_batch: Optional[int] = None, top_k: int = 100,
                 temperature: float = 1.0, seed: int = 0):
        assert context_length == 2 and segment_length == 12, \
            "Only support context_length=2 and segment_length=12."
        self.tokenizer = tokenizer
        self.tok_params = tok_params
        self.model = model
        self.lm_params = lm_params
        self.ctx = context_length
        self.seg = segment_length
        self.max_batch = max_batch
        self.top_k = top_k
        self.temperature = temperature
        self._seed = seed
        self._calls = 0

    def close(self):
        pass

    def _predict_chunk(self, context_frames: np.ndarray,
                       actions: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        from ivideogpt_tpu import generation, tokens

        B = context_frames.shape[0]
        act = jnp.asarray(actions, jnp.float32)

        # CEM populations share one context across candidates: encode it
        # once and tile the token grid (the reference re-tokenizes the
        # repeated context for every candidate, :155-167)
        shared = B > 1 and bool(
            (context_frames == context_frames[:1]).all())
        enc_in = context_frames[:1] if shared else context_frames
        idx_c = self.tokenizer.apply(self.tok_params,
                                     jnp.asarray(enc_in, jnp.float32),
                                     method=self.tokenizer.encode_context)
        if shared:
            idx_c = jnp.tile(idx_c, (B, 1, 1))
        scf = self.tokenizer.config.scf_token
        sdf = self.tokenizer.config.sdf_token
        scf_col = jnp.full((B, self.ctx, 1), scf, jnp.int32)
        stream_c = jnp.concatenate([scf_col, idx_c], 2).reshape(B, -1)[:, 1:]
        prelude = jnp.concatenate(
            [stream_c, jnp.full((B, 1), sdf, jnp.int32)], axis=1)

        # pad actions to segment length (generation indexes ctx..T-1)
        T = self.seg
        if act.shape[1] < T:
            pad = jnp.zeros((B, T - act.shape[1], act.shape[2]), act.dtype)
            act = jnp.concatenate([act, pad], axis=1)
        act = act[:, :T]

        self._calls += 1
        res = generation.generate(
            self.model, self.lm_params, prelude,
            jax.random.key(self._seed + self._calls),
            segment_length=T, context_length=self.ctx, action=act,
            tokens_per_dyna=self.tokenizer.config.dyn_tokens_per_frame,
            top_k=self.top_k, temperature=self.temperature)

        frames = self.tokenizer.apply(self.tok_params, res.tokens, self.ctx,
                                      method=self.tokenizer.detokenize)
        return np.clip(np.asarray(frames, np.float32), 0.0, 1.0)

    def __call__(self, batch):
        """batch: {"video": [B, 2, H, W, C] in [0,1], "actions": [B, T, A]}
        -> {"rgb": [B, seg-1, H, W, C]} (reference :141-206)."""
        video = np.asarray(batch["video"], np.float32)
        actions = np.asarray(batch["actions"], np.float32)
        B = video.shape[0]
        mb = self.max_batch or B
        outs = []
        for i in range(0, B, mb):
            outs.append(self._predict_chunk(video[i:i + mb],
                                            actions[i:i + mb]))
        out = np.concatenate(outs, axis=0)
        return {"rgb": out[:, 1:]}  # drop the first (context) frame slot
