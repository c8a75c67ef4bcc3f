"""Fully on-device autoregressive video-token generation.

The reference generates via a host-side Python loop over HF ``generate``
calls — one per future frame, each spinning up its own sampling loop
(reference transformer/action_model.py:57-151, inference/predict.py:64).
Here the ENTIRE rollout is one jitted ``lax.scan`` over a preallocated KV
cache: prefill the prelude, then one uniform token step per position, with
the per-frame sdf separators *forced* (not sampled) and action embeddings
injected at exactly those slots. No host round-trips, static shapes,
bf16 cache.

Sequence bookkeeping (ctx tokens per frame C=256, dyn D=16):
  input  = prelude + first sdf            (length (C+1)*ctx, e.g. 514)
  steps  = (D+1) * (T-ctx)                one token written per step
  step s writes: sampled dyn token if s%(D+1) < D, else forced sdf
  output = stream[:, :-1]                 final sdf dropped
  (matches reference max_new_tokens = (D+1)*(T-ctx) - 1, predict.py:57)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray            # [B, seq_len] full token stream
    rewards: Optional[jnp.ndarray]  # [B, T-ctx] or None


def cast_matmul_params(params, dtype=jnp.bfloat16):
    """Cast every >=2-D float param (dense kernels, embed tables) to the
    compute dtype, leaving 1-D params (norm scales, biases) fp32.

    Bit-identical for a bf16-compute model (which casts per-use anyway),
    but pre-casting once per rollout stops the decode scan re-reading the
    fp32 master copies every token — 2x the weight HBM traffic — and, done
    host-side (bench.py), frees the fp32 master tree from HBM entirely.
    Single definition: generate(), replay_logits(), and bench.py must all
    apply the SAME predicate or divergence studies compare different
    weights.
    """
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "ndim") and x.ndim >= 2
        and jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def cast_conv_params(params, dtype=jnp.bfloat16):
    """Tokenizer-side companion to :func:`cast_matmul_params`: cast >=3-D
    float params (conv kernels) to the compute dtype, leaving 1-/2-D params
    fp32 — 2-D tokenizer params are the VQ codebooks, which must stay fp32
    for exact distance lookups. Same single-predicate rule: bench.py and
    the MBRL rollout must share this cast or divergence studies compare
    different weights."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "ndim") and x.ndim >= 3
        and jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def exact_top_k_two_stage(logits: jnp.ndarray, k: int, group: int = 2048):
    """Exact top-k via group-local top-k + merge (4x faster than the global
    lax.top_k sort over a 16k vocab on v5e: every global top-k element is in
    the top-k of its own group, so reducing each group first is lossless).

    logits [B, V] -> (vals [B, k], idxs [B, k]).
    """
    B, V = logits.shape
    if V <= group or group < k:
        return jax.lax.top_k(logits, k)
    G = V // group
    rem = V - G * group  # e.g. vocab 16386 = 8*2048 + 2 (scf/sdf columns)
    x = logits[:, :G * group].reshape(B, G, group)
    v1, i1 = jax.lax.top_k(x, k)                      # [B, G, k] per group
    offs = (jnp.arange(G, dtype=jnp.int32) * group)[None, :, None]
    cand_v = v1.reshape(B, G * k)
    cand_i = (i1 + offs).reshape(B, G * k)
    if rem:
        # tail columns join the merge as candidates directly (still exact)
        tail_i = jnp.broadcast_to(
            jnp.arange(G * group, V, dtype=jnp.int32)[None], (B, rem))
        cand_v = jnp.concatenate([cand_v, logits[:, G * group:]], axis=-1)
        cand_i = jnp.concatenate([cand_i, tail_i], axis=-1)
    v2, sel = jax.lax.top_k(cand_v, k)                # merge stage
    return v2, jnp.take_along_axis(cand_i, sel, axis=-1)


def _float32_order_key(x: jnp.ndarray) -> jnp.ndarray:
    """Monotonic uint32 key: a > b  <=>  key(a) > key(b) (finite floats)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(x >= 0, b | jnp.uint32(0x80000000), ~b)


def _bf16_order_key(x: jnp.ndarray) -> jnp.ndarray:
    """Monotonic uint16 key over bf16 values (same construction)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    return jnp.where(x >= 0, b | jnp.uint16(0x8000), ~b)


def exact_kth_largest_key_bf16(logits: jnp.ndarray, k: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """16-pass variant of :func:`exact_kth_largest_key` for logits that are
    EXACTLY bf16-representable (i.e. produced by a bf16 matmul and merely
    upcast to fp32 afterwards — ``LlamaModel.unembed`` under
    ``dtype=bfloat16``). The whole order lives in 16 bits, so the search
    needs 16 compare+count passes over a uint16 view instead of 16 + 16
    over uint32: ~3x less compare traffic per sampled token.

    Caller contract: only pass logits whose values round-trip bf16
    losslessly; otherwise the restriction set can differ from the true
    fp32 top-k at sub-bf16 margins.
    """
    keys = _bf16_order_key(logits)
    B = logits.shape[0]
    p = jnp.zeros((B, 1), jnp.uint16)
    for bit in range(15, -1, -1):
        cand = p | jnp.uint16(1 << bit)
        cnt = jnp.sum((keys >= cand).astype(jnp.int32), axis=1,
                      keepdims=True)
        p = jnp.where(cnt >= k, cand, p)
    return keys, p[:, 0]


def exact_kth_largest_key(logits: jnp.ndarray, k: int) -> Tuple[jnp.ndarray,
                                                                jnp.ndarray]:
    """(keys [B, V], kth [B]): the order key of each logit and the exact
    k-th largest key per row, via a 32-step binary search on the key bits.

    Each step is one cheap compare+count pass over [B, V] — on TPU the
    whole search beats the sort-based TopK custom call by ~2x at
    V=16386, k=100 (tools/bench_topk.py). Exact: no recall target.
    """
    keys = _float32_order_key(logits)
    B = logits.shape[0]
    # phase 1: search the high 16 bits on a uint16 view (half the compare
    # traffic; truncation is monotone, so the k-th of the truncated keys IS
    # the truncation of the k-th key)
    hi = (keys >> 16).astype(jnp.uint16)
    ph = jnp.zeros((B, 1), jnp.uint16)
    for bit in range(15, -1, -1):
        cand = ph | jnp.uint16(1 << bit)
        cnt = jnp.sum((hi >= cand).astype(jnp.int32), axis=1, keepdims=True)
        ph = jnp.where(cnt >= k, cand, ph)
    # phase 2: low 16 bits on the full keys
    p = ph.astype(jnp.uint32) << 16
    for bit in range(15, -1, -1):
        cand = p | jnp.uint32(1 << bit)
        cnt = jnp.sum((keys >= cand).astype(jnp.int32), axis=1, keepdims=True)
        p = jnp.where(cnt >= k, cand, p)
    return keys, p[:, 0]


def sample_top_k(rng, logits: jnp.ndarray, top_k: int = 100,
                 temperature: float = 1.0,
                 approx: bool = False,
                 threshold_search: bool = True,
                 bf16_exact: bool = False) -> jnp.ndarray:
    """HF-equivalent top-k sampling: restrict to the k best, then sample
    from softmax(logits/T) over them.

    Exact paths:
    - threshold_search=True (default): find the exact k-th value by bit
      search, mask everything strictly below it to -inf, one categorical
      over the vocab. Ties AT the k-th value are all kept — exactly HF's
      ``TopKLogitsWarper`` (``logits < topk(k).values[..., -1]`` is
      removed), which is what the reference's ``generate`` applies
      (reference action_model.py:86-110). lax.top_k/torch.topk instead
      rank-limit ties toward lower indices; the restriction sets agree
      whenever there is no tie at the boundary.
    - threshold_search=False: two-stage group top-k + categorical over the
      k values (rank-limited ties, torch.topk stability).
    approx=True uses jax.lax.approx_max_k (TPU partial reduction, recall
    ~0.95): statistically near-identical samples at a fraction of the cost.
    """
    if approx:
        vals, idxs = jax.lax.approx_max_k(logits, top_k)
        choice = jax.random.categorical(rng, vals / temperature, axis=-1)
        return jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
    if threshold_search:
        if bf16_exact:
            # logits are bf16-exact (bf16 unembed, fp32 upcast): the 16-bit
            # search finds the identical restriction set in half the passes
            keys, kth = exact_kth_largest_key_bf16(logits, top_k)
        else:
            keys, kth = exact_kth_largest_key(logits, top_k)
        keep = keys >= kth[:, None]
        masked = jnp.where(keep, logits / temperature, -jnp.inf)
        return jax.random.categorical(rng, masked, axis=-1)
    vals, idxs = exact_top_k_two_stage(logits, top_k)  # [B, k]
    choice = jax.random.categorical(rng, vals / temperature, axis=-1)  # [B]
    return jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("model", "segment_length", "context_length",
                     "tokens_per_dyna", "top_k", "reward_prediction",
                     "cache_dtype", "approx_top_k", "cache_layout",
                     "read_len_buckets"))
def generate(model, params, prelude_tokens: jnp.ndarray, rng: jax.Array,
             *, segment_length: int, context_length: int,
             action: Optional[jnp.ndarray] = None,
             tokens_per_dyna: int = 16, top_k: int = 100,
             temperature: float = 1.0, reward_prediction: bool = False,
             cache_dtype=jnp.bfloat16,
             approx_top_k: bool = False,
             cache_layout: str = "bshd",
             read_len_buckets: Optional[int] = None) -> GenerateResult:
    """Autoregressive rollout of (segment_length - context_length) frames.

    read_len_buckets: compile-time knob for the frame-structured path.
    None (default) = auto: 4 on the bshd layout, off elsewhere (the knob
    only shapes the bshd frame loop; an EXPLICIT nonzero value with
    another layout raises, since as a static jit arg every swept value
    would otherwise recompile a no-op). 0
    gives every frame its own static attended-prefix length (read_len) —
    minimal cache-read HBM traffic, but F distinct inner-scan bodies for
    XLA to optimize. N>0 rounds the per-frame read_len schedule UP to at
    most N distinct values, so frames in the same bucket share one
    compiled scan body (XLA dedups identical computations). Results are
    BIT-IDENTICAL either way: read_len only over-approximates the valid
    prefix and attention masks past the current position; buckets merely
    read (masked) dead tail. Trade: fewer unique bodies = faster compile,
    more dead-tail bandwidth late in early frames. Default 4 from the
    round-4 TPU sweep at the headline regime (ctx=2, B=256, cold cache):
    compile 307s -> 142s (-54%) for -0.17% fps (1252.8 -> 1250.7); the
    lowered HLO structure (scan/dot counts) is unchanged.

    Args:
      model: a bound-free HeadModelWithAction (methods used via apply).
      prelude_tokens: [B, P1] context tokens + first sdf.
      action: [B, T, A] continuous actions, or None for action-free.
    Returns:
      GenerateResult(tokens [B, P1 - 1 + (D+1)*F], rewards [B, F] | None)
    """
    B, P1 = prelude_tokens.shape
    F = segment_length - context_length
    D1 = tokens_per_dyna + 1
    steps = D1 * F
    total = P1 + steps
    sdf_token = model.llm_config.vocab_size - 1  # reference action_model.py:26

    if getattr(model, "dtype", jnp.float32) in (jnp.bfloat16, jnp.float16):
        params = cast_matmul_params(params, model.dtype)
    # bf16 unembed -> logits are bf16-exact: the 16-bit threshold search
    # finds the identical top-k restriction set in half the passes
    bf16_exact = getattr(model, "dtype", jnp.float32) == jnp.bfloat16

    if read_len_buckets is None:
        read_len_buckets = 4 if cache_layout == "bshd" else 0
    elif read_len_buckets and cache_layout != "bshd":
        # fail loudly on explicit misuse: the knob only shapes the bshd
        # frame loop, but as a static jit arg every swept value would
        # otherwise recompile a no-op
        raise ValueError(
            f"read_len_buckets applies to cache_layout='bshd' only "
            f"(got {cache_layout!r})")

    def m(method, *args):
        return model.apply(params, *args, method=getattr(model, method))

    # --- prefill ----------------------------------------------------------
    embeds = m("embed_tokens", prelude_tokens)
    if action is not None:
        action_embeds = m("action_embeds", action)  # [B, T, H]
        # the first sdf (last prelude slot) gets action[ctx-1]
        embeds = embeds.at[:, P1 - 1, :].add(
            action_embeds[:, context_length - 1, :].astype(embeds.dtype))
    else:
        action_embeds = None

    cache = m("init_cache", B, total, cache_dtype, cache_layout)
    hidden, cache = m("decode_cached", embeds, cache, 0)
    last_logits = m("unembed", hidden[:, -1, :])

    buf = jnp.zeros((B, total), dtype=prelude_tokens.dtype)
    buf = jax.lax.dynamic_update_slice(buf, prelude_tokens, (0, 0))

    # --- one uniform token step -------------------------------------------
    # all step keys pre-split outside the scan (an in-loop split costs a
    # threefry launch per token)
    step_keys = jax.random.split(rng, steps)

    def step(carry, xs, read_len=None):
        s, sub = xs
        buf, cache, last_logits = carry
        in_frame = s % D1          # 0..D-1 sampled, D forced sdf
        frame = s // D1

        sampled = sample_top_k(sub, last_logits, top_k, temperature,
                               approx=approx_top_k, bf16_exact=bf16_exact)
        token = jnp.where(in_frame == tokens_per_dyna,
                          jnp.full_like(sampled, sdf_token), sampled)
        buf = jax.lax.dynamic_update_slice(
            buf, token[:, None].astype(buf.dtype), (0, P1 + s))

        emb = m("embed_tokens", token[:, None])
        if action_embeds is not None:
            # a forced sdf opens frame (frame + 1): inject its action
            a_idx = context_length + frame  # action index ctx-1 + (frame+1)
            a = jax.lax.dynamic_slice_in_dim(action_embeds, a_idx, 1, axis=1)
            emb = emb + jnp.where(in_frame == tokens_per_dyna,
                                  a.astype(emb.dtype), 0)

        hidden, cache = m("decode_cached", emb, cache, P1 + s, True, read_len)
        logits = m("unembed", hidden[:, 0, :])
        if reward_prediction:
            # reward read off the hidden state after the frame's last dyn
            # token (reference video_predictor.py:298-313 semantics)
            r = m("reward", hidden[:, 0, :])
        else:
            r = jnp.zeros((B,), jnp.float32)
        return (buf, cache, logits), r

    def sampled_step(carry, xs, read_len=None):
        # one *sampled* dyn-token step (no sdf handling: the frame loop
        # below forces separators explicitly, so this body carries no
        # per-step `where` branches and no wasted sampling at sdf slots)
        s, sub = xs
        buf, cache, last_logits = carry
        token = sample_top_k(sub, last_logits, top_k, temperature,
                             approx=approx_top_k, bf16_exact=bf16_exact)
        buf = jax.lax.dynamic_update_slice(
            buf, token[:, None].astype(buf.dtype), (0, P1 + s))
        emb = m("embed_tokens", token[:, None])
        hidden, cache = m("decode_cached", emb, cache, P1 + s, True, read_len)
        logits = m("unembed", hidden[:, 0, :])
        if reward_prediction:
            r = m("reward", hidden[:, 0, :])
        else:
            r = jnp.zeros((B,), jnp.float32)
        return (buf, cache, logits), r

    if cache_layout == "bshd":
        # Frame-structured rollout:
        # - per-frame inner scans with a statically growing attended prefix
        #   (read_len): frame f only needs cache[:, :P1 + (f+1)*(D+1)], and
        #   the static slice fuses into the attention reads, skipping the
        #   HBM traffic for the dead cache tail (~15% of the decode
        #   bandwidth floor at ctx=2, T=16)
        # - sdf separators are forced *outside* the scans: no top-k run on
        #   slots whose sample is discarded, and the final sdf (dropped
        #   from the output, reference action_model.py:116-121) never
        #   decodes at all
        D = tokens_per_dyna
        sdf_ids = jnp.full((B, 1), sdf_token, prelude_tokens.dtype)
        sdf_emb = m("embed_tokens", sdf_ids)
        carry = (buf, cache, last_logits)
        frame_rewards = []
        rls = [min(total, -(-(P1 + (f + 1) * D1) // 8) * 8)
               for f in range(F)]
        if read_len_buckets and 0 < read_len_buckets < F:
            nb = read_len_buckets
            # frame f -> read_len of the LAST frame in its bucket (round the
            # schedule UP; monotone, <= total, at most nb distinct values)
            def bucket_last(f):
                b = f * nb // F               # bucket index of frame f
                return -(-(b + 1) * F // nb) - 1  # ceil((b+1)*F/nb) - 1
            rls = [rls[bucket_last(f)] for f in range(F)]
        for f in range(F):
            rl = rls[f]
            s0 = f * D1
            last_frame = f == F - 1
            # without a reward head, the rollout's very last sampled token
            # needs no decode at all (its logits would only feed the final
            # dropped sdf): sample it outside the scan and stop
            n_scan = D - 1 if (last_frame and not reward_prediction) else D
            xs = (jnp.arange(s0, s0 + n_scan), step_keys[s0:s0 + n_scan])
            carry, r = jax.lax.scan(
                functools.partial(sampled_step, read_len=rl), carry, xs)
            if last_frame and not reward_prediction:
                buf, cache, last_logits = carry
                token = sample_top_k(step_keys[s0 + D - 1], last_logits,
                                     top_k, temperature, approx=approx_top_k,
                                     bf16_exact=bf16_exact)
                buf = jax.lax.dynamic_update_slice(
                    buf, token[:, None].astype(buf.dtype),
                    (0, P1 + s0 + D - 1))
                carry = (buf, cache, last_logits)
            if reward_prediction:
                frame_rewards.append(r[-1])  # after the frame's last dyn token
            if f < F - 1:
                # forced sdf opening frame f+1, with its action injected
                buf, cache, last_logits = carry
                pos = P1 + s0 + D
                buf = jax.lax.dynamic_update_slice(buf, sdf_ids, (0, pos))
                emb = sdf_emb
                if action_embeds is not None:
                    emb = emb + action_embeds[:, context_length + f, None, :]\
                        .astype(emb.dtype)
                hidden, cache = m("decode_cached", emb, cache, pos, True, rl)
                last_logits = m("unembed", hidden[:, 0, :])
                carry = (buf, cache, last_logits)
        (buf, _, _) = carry
        tokens = buf[:, :-1]  # final sdf slot was never written nor needed
        if reward_prediction:
            rewards = jnp.stack(frame_rewards, axis=1).astype(jnp.float32)
            return GenerateResult(tokens, rewards)
        return GenerateResult(tokens, None)

    (buf, _, _), rewards = jax.lax.scan(
        step, (buf, cache, last_logits), (jnp.arange(steps), step_keys))

    tokens = buf[:, :-1]  # drop the final (unused) sdf
    if reward_prediction:
        # step s has in_frame == D-1 right after the frame's last dyn token
        sel = jnp.arange(F) * D1 + (tokens_per_dyna - 1)
        return GenerateResult(tokens, rewards[sel].T.astype(jnp.float32))
    return GenerateResult(tokens, None)


@functools.partial(
    jax.jit,
    static_argnames=("model", "segment_length", "context_length",
                     "tokens_per_dyna", "cache_dtype", "cache_layout"))
def replay_logits(model, params, stream: jnp.ndarray,
                  *, segment_length: int, context_length: int,
                  action: Optional[jnp.ndarray] = None,
                  tokens_per_dyna: int = 16,
                  cache_dtype=jnp.bfloat16,
                  cache_layout: str = "bshd") -> jnp.ndarray:
    """Teacher-forced KV-cached replay of a token stream: the per-step
    logits the decode path would sample from, under a given cache dtype.

    Diagnostic API for the int8-cache quality study: replaying the SAME
    stream under bf16 and int8 caches isolates the cache-quantization
    effect on the sampling distribution (per-step logit error, top-k set
    drift) from sampling divergence. Alignment matches ``generate``:
    logits[0] is the prefill output at position P1-1 (the distribution the
    first dyn token is sampled from); logits[s] for s>0 follows the decode
    of stream position P1-1+s.

    Args:
      stream: [B, L] the full token stream as returned by generate()
        (prelude + generated, final sdf already dropped).
    Returns:
      [S, B, V] float32 logits, S = L - P1 + 1 steps.
    """
    B, L = stream.shape
    D1 = tokens_per_dyna + 1
    F = segment_length - context_length
    ctx_tokens = (model.head_config.tokens_per_context
                  if hasattr(model, "head_config") else 256)
    P1 = (ctx_tokens + 1) * context_length  # prelude incl. first sdf

    if getattr(model, "dtype", jnp.float32) in (jnp.bfloat16, jnp.float16):
        params = cast_matmul_params(params, model.dtype)

    def m(method, *args):
        return model.apply(params, *args, method=getattr(model, method))

    embeds = m("embed_tokens", stream)
    if action is not None:
        # action embeddings at every sdf slot (mirror of the training
        # forward, models/action_model.py __call__)
        positions = P1 - 1 + jnp.arange(F) * D1
        a = m("action_embeds", action)[:, context_length - 1:-1, :]
        embeds = embeds.at[:, positions, :].add(a.astype(embeds.dtype))

    cache = m("init_cache", B, L + 1, cache_dtype, cache_layout)
    hidden, cache = m("decode_cached", embeds[:, :P1], cache, 0)
    first = m("unembed", hidden[:, -1, :])

    def step(cache, xs):
        emb, idx = xs
        hidden, cache = m("decode_cached", emb[:, None, :], cache, idx, True)
        return cache, m("unembed", hidden[:, 0, :])

    idxs = jnp.arange(P1, L)
    _, rest = jax.lax.scan(step, cache,
                           (jnp.moveaxis(embeds[:, P1:], 1, 0), idxs))
    return jnp.concatenate(
        [first[None].astype(jnp.float32), rest.astype(jnp.float32)], axis=0)
