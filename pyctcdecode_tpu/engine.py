"""TPU device engine: fixed-width vectorized CTC beam search under ``lax.scan``.

This is the performance path of the framework. Where the reference walks
Python dataclass beams through dict merges and per-word C++ LM callbacks
(ref ``decoder.py:426-556``), this engine keeps the *entire* beam state as
fixed-shape device arrays and runs the per-frame pipeline

    expand (B beams x K tokens, masked 4-way transition)
    -> merge (sort by 64-bit beam key + segmented logsumexp)
    -> LM fuse (device n-gram hash tables + vocab trie, per-beam word commit)
    -> window prune -> top-k -> optional history prune

as one fused XLA program, scanned over frames. Text never exists on device:
beams are 2x32-bit rolling hashes plus a trie node, and each frame emits a
``(parent, token)`` backpointer pair; transcripts and word-level frame spans
are reconstructed on host by backtracing and replaying the transition
system (identical rules to the host engine, which is the parity oracle).

The engine is exposed at two granularities:

* :func:`make_decode_fn` — one jittable function for a whole utterance
  (scan + finalization), used by the one-shot and batch APIs;
* :func:`make_stream_fns` — ``init`` / ``chunk`` / ``finalize`` pieces with
  a device-resident carried state, used by the streaming API
  (ref ``decoder.py:669-728`` semantics: chunked == full, force-commit and
  end-of-stream handling as traced flags so no recompilation per mode).

Semantic parity notes (vs the host engine / reference):

* merge key = (text, partial word, last token, BPE break flag); the newest
  colliding candidate donates metadata while the *first* occurrence keeps
  the rank position, matching dict-insertion semantics (ref decoder.py:211-224).
* tie-breaks in top-k resolve by candidate enumeration order
  (token-major, beam-minor, tokens ascending), matching heapq stability.
* LM fusion reproduces the per-word fused formula and OOV/partial rules of
  ``models/language_model.py`` using f32 table math (KenLM stores f32).
* scores accumulate in f32 on device (vs float64 on host): logit scores may
  drift ~1e-4 over hundreds of frames; ranking is unaffected in practice.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import numpy as np

from .constants import AVG_TOKEN_LEN, LOG_BASE_CHANGE_FACTOR
from .models.device_tables import DeviceLM, lm_score_words_jnp
from .ops.hashing import hash_extend_char, hash_text_commit
from .ops.tokens import KIND_BLANK, KIND_BOUNDARY, TokenArrays

DEAD = -1.0e30
DEAD_THRESH = -1.0e29


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (compile-time) decode configuration."""

    beam_width: int
    vocab_size: int
    k_tokens: int  # tokens expanded per frame (== vocab_size: exact parity)
    is_bpe: bool
    use_lm: bool
    order: int  # 1 when no LM
    prune_history: bool
    use_hotwords: bool = False

    @property
    def ctx_width(self) -> int:
        return max(self.order - 1, 1)

    @property
    def ring_width(self) -> int:
        return max(self.order - 1, 1)


def _mix_key(jnp, a, b, c, d):
    """Fold four uint32 streams into one uint32 lane."""
    h = a * jnp.uint32(0x01000193) ^ b
    h = h * jnp.uint32(0x01000193) ^ c
    return h * jnp.uint32(0x01000193) ^ d


def _build_dev_tables(jnp, tokens: TokenArrays, device_lm: Optional[DeviceLM]):
    tok_dev = {
        "kind": jnp.asarray(tokens.kind),
        "piece_len": jnp.asarray(tokens.piece_len),
        "raw_chars": jnp.asarray(tokens.raw_chars),
        "raw_len": jnp.asarray(tokens.raw_len),
        "right_bound": jnp.asarray(tokens.right_bound),
        "seed_lo": jnp.asarray(tokens.seed_hash_lo),
        "seed_hi": jnp.asarray(tokens.seed_hash_hi),
    }
    if device_lm is not None:
        dev = device_lm.as_device()
        dev["unk_id"] = device_lm.unk_id
        dev["eos_id"] = device_lm.eos_id
        dev["unk_prob10"] = np.float32(device_lm.unk_prob10)
        dev["has_unigrams"] = device_lm.has_unigrams
        dev["seed_node_arr"] = dev["seed_node"]
    else:
        dev = {}
    return tok_dev, dev


def _params_dict(params):
    return {
        "token_min_logp": params[0],
        "beam_prune_logp": params[1],
        "alpha": params[2],
        "beta": params[3],
        "unk_offset": params[4],
        "score_boundary": params[5] > 0.5,
        "hot_weight": params[6],
    }


def _init_state(jnp, cfg: EngineConfig, start_ctx, start_ctx_len):
    b = cfg.beam_width
    u32z = jnp.zeros((b,), dtype=jnp.uint32)
    i32 = functools.partial(jnp.zeros, (b,), dtype=jnp.int32)
    logit = jnp.full((b,), DEAD, dtype=jnp.float32).at[0].set(0.0)
    return {
        "text_lo": u32z,
        "text_hi": u32z,
        "p_lo": u32z,
        "p_hi": u32z,
        "p_node": i32(),
        "p_len": i32(),
        "last_tok": jnp.where(
            jnp.arange(b) == 0, -1, -2 - jnp.arange(b, dtype=jnp.int32)
        ).astype(jnp.int32),
        "force": jnp.zeros((b,), dtype=bool),
        "logit": logit,
        "fused": jnp.zeros((b,), dtype=jnp.float32),
        "ctx": jnp.broadcast_to(start_ctx, (b, cfg.ctx_width)).astype(jnp.int32),
        "ctx_len": jnp.full((b,), start_ctx_len, dtype=jnp.int32),
        "ring_lo": jnp.zeros((b, cfg.ring_width), dtype=jnp.uint32),
        "ring_hi": jnp.zeros((b, cfg.ring_width), dtype=jnp.uint32),
        "n_words": i32(),
        **({"h_node": i32()} if cfg.use_hotwords else {}),
    }


def _commit_quantities(
    jnp, cfg: EngineConfig, dev: Dict, hot: Dict, params: Dict, state: Dict
):
    """Per-beam word-commit effects (LM score, context, text hash, hotwords)."""
    commit = state["p_len"] > 0
    if cfg.use_hotwords:
        # full-word hotword boost at commit (ref language_model.py:137-139:
        # weight x #matching words, accumulated incrementally)
        hot_gain = params["hot_weight"] * (
            hot["is_word"][state["h_node"]] & commit
        ).astype(jnp.float32)
    else:
        hot_gain = jnp.zeros_like(state["fused"])
    t_lo, t_hi = hash_text_commit(
        jnp, state["text_lo"], state["text_hi"], state["p_lo"], state["p_hi"]
    )
    text_lo_c = jnp.where(commit, t_lo, state["text_lo"])
    text_hi_c = jnp.where(commit, t_hi, state["text_hi"])
    ring_lo_push = jnp.concatenate(
        [state["ring_lo"][:, 1:], state["p_lo"][:, None]], axis=1
    )
    ring_hi_push = jnp.concatenate(
        [state["ring_hi"][:, 1:], state["p_hi"][:, None]], axis=1
    )
    ring_lo_c = jnp.where(commit[:, None], ring_lo_push, state["ring_lo"])
    ring_hi_c = jnp.where(commit[:, None], ring_hi_push, state["ring_hi"])
    n_words_c = state["n_words"] + commit.astype(jnp.int32)

    if not cfg.use_lm:
        return {
            "commit": commit,
            "word_fused": hot_gain,
            "ctx": state["ctx"],
            "ctx_len": state["ctx_len"],
            "text_lo": text_lo_c,
            "text_hi": text_hi_c,
            "ring_lo": ring_lo_c,
            "ring_hi": ring_hi_c,
            "n_words": n_words_c,
        }

    node = state["p_node"]
    wid_raw = dev["trie_word_id"][node]
    in_model = wid_raw >= 0
    wid = jnp.where(in_model, wid_raw, dev["unk_id"])
    in_uni = dev["trie_is_uni_word"][node]
    is_oov = (dev["has_unigrams"] & ~in_uni) | ~in_model
    raw10, new_ctx, new_ctx_len = lm_score_words_jnp(
        dev, cfg.order, dev["unk_prob10"], state["ctx"], state["ctx_len"], wid
    )
    raw10 = raw10 + params["unk_offset"] * is_oov.astype(jnp.float32)
    word_fused = params["alpha"] * raw10 * np.float32(LOG_BASE_CHANGE_FACTOR) + params["beta"]
    word_fused = jnp.where(commit, word_fused, 0.0) + hot_gain
    return {
        "commit": commit,
        "word_fused": word_fused,
        "ctx": jnp.where(commit[:, None], new_ctx, state["ctx"]),
        "ctx_len": jnp.where(commit, new_ctx_len, state["ctx_len"]),
        "text_lo": text_lo_c,
        "text_hi": text_hi_c,
        "ring_lo": ring_lo_c,
        "ring_hi": ring_hi_c,
        "n_words": n_words_c,
    }


def _merge_dense(jnp, keys, valid, logit):
    """Dense block-diagonal prefix merge (the TPU-friendly formulation).

    A candidate's merge key includes the token just applied (it becomes
    ``last_char``, ref decoder.py:211-224), so candidates can only collide
    *within one token column*. That makes the merge a batch of tiny B x B
    masked reductions instead of a global sort + segmented scatter — pure
    VPU work with no scatters, the single biggest perf lever of the engine.

    ``keys``: list of uint32 arrays ``[..., B]`` (pre-mixed hash lanes);
    ``valid``/``logit``: ``[..., B]``. Returns ``(merged_logit, dup, donor)``
    where ``dup[i]`` marks a non-first member of a merge group (to kill),
    ``merged_logit`` is the group logsumexp, and ``donor[i]`` is the
    newest member's index within the block (metadata source, matching the
    reference's newest-wins dict update).
    """
    b = keys[0].shape[-1]
    eq = valid[..., :, None] & valid[..., None, :]
    for f in keys:
        eq = eq & (f[..., :, None] == f[..., None, :])
    idx = jnp.arange(b, dtype=jnp.int32)
    earlier = idx[None, :] < idx[:, None]  # j < i
    dup = jnp.any(eq & earlier, axis=-1)
    lj = logit[..., None, :]
    m = jnp.max(jnp.where(eq, lj, -jnp.inf), axis=-1)
    tot = jnp.sum(jnp.where(eq, jnp.exp(lj - m[..., None]), 0.0), axis=-1)
    merged = m + jnp.log(tot)
    donor = jnp.max(jnp.where(eq, idx[None, :], -1), axis=-1)
    return merged, dup, jnp.maximum(donor, 0)


def _rank(jnp, cfg, lm_score_flat, logit_flat, src_flat, beam_prune_logp):
    """Window prune relative to the best, then top-k (ref decoder.py:536-554)."""
    import jax

    mx = jnp.max(lm_score_flat)
    keep = lm_score_flat >= mx + beam_prune_logp
    sc = jnp.where(keep, lm_score_flat, DEAD)
    top_scores, top_idx = jax.lax.top_k(sc, cfg.beam_width)
    return top_scores, logit_flat[top_idx], src_flat[top_idx]


def _partial_score(jnp, cfg, dev, hot, prm, node, h_node, plen):
    """score_partial_token for in-progress words.

    Hotword-prefix partials use the hotword completion score
    (ref decoder.py:410-418, language_model.py:141-150); everything else
    uses the LM's unknown-prefix penalty (ref language_model.py:326-336).
    """
    plen_f = plen.astype(jnp.float32)
    if cfg.use_lm:
        is_pref = dev["trie_is_uni_prefix"][node]
        punk = prm["unk_offset"] * (~is_pref).astype(jnp.float32)
        punk = jnp.where(plen > AVG_TOKEN_LEN, punk * plen_f / AVG_TOKEN_LEN, punk)
        lm_part = jnp.where(plen > 0, punk, 0.0)
    else:
        lm_part = jnp.zeros_like(plen_f)
    if not cfg.use_hotwords:
        return lm_part
    hot_pref = (h_node != hot["dead"]) & (plen > 0)
    hot_part = prm["hot_weight"] * plen_f / jnp.maximum(
        hot["min_comp"][h_node], 1
    ).astype(jnp.float32)
    return jnp.where(hot_pref, hot_part, lm_part)


def _make_step(jnp, cfg: EngineConfig, tok_dev: Dict, dev: Dict, hot: Dict, prm: Dict, n_frames):
    """Build the per-frame scan body."""
    import jax

    b = cfg.beam_width
    k = cfg.k_tokens
    v = cfg.vocab_size
    c = b * k
    lmax = int(tok_dev["raw_chars"].shape[1])

    def _flatten(x):
        """[B, K, ...] -> [K*B, ...] in token-major order (ref enumeration)."""
        return jnp.swapaxes(x, 0, 1).reshape((c,) + x.shape[2:])

    def step(state, xs):
        """One frame: expand -> merge -> fuse -> prune -> top-k."""
        logp_row, t = xs
        active = t < n_frames
        if k < v:
            _, toks = jax.lax.top_k(logp_row, k)
            toks = jnp.sort(toks).astype(jnp.int32)
            tok_logp = logp_row[toks]
        else:
            toks = jnp.arange(v, dtype=jnp.int32)
            tok_logp = logp_row
        argmax_tok = jnp.argmax(logp_row).astype(jnp.int32)
        admit = (tok_logp >= prm["token_min_logp"]) | (toks == argmax_tok)

        tok_kind = tok_dev["kind"][toks]
        blank = tok_kind == KIND_BLANK
        boundary_kind = tok_kind == KIND_BOUNDARY
        tok_right = tok_dev["right_bound"][toks]
        tok_plen = tok_dev["piece_len"][toks]  # boundary piece length
        tok_rlen = tok_dev["raw_len"][toks]  # raw label length

        alive = state["logit"] > DEAD_THRESH
        cm = _commit_quantities(jnp, cfg, dev, hot, prm, state)

        # ---- transition classes [B, K]
        stay = blank[None, :] | (state["last_tok"][:, None] == toks[None, :])
        if cfg.is_bpe:
            as_boundary = ~stay & (boundary_kind[None, :] | state["force"][:, None])
        else:
            as_boundary = ~stay & boundary_kind[None, :]

        # ---- partial-word extension walk (regular children, raw label)
        ext_lo = jnp.broadcast_to(state["p_lo"][:, None], (b, k))
        ext_hi = jnp.broadcast_to(state["p_hi"][:, None], (b, k))
        if cfg.use_lm:
            ext_node = jnp.broadcast_to(state["p_node"][:, None], (b, k))
        if cfg.use_hotwords:
            ext_hnode = jnp.broadcast_to(state["h_node"][:, None], (b, k))
        for l in range(lmax):
            cid = tok_dev["raw_chars"][toks, l]  # [K]
            has = (cid >= 0)[None, :]
            cid_b = jnp.broadcast_to(jnp.maximum(cid, 0)[None, :], (b, k))
            nlo, nhi = hash_extend_char(jnp, ext_lo, ext_hi, cid_b)
            ext_lo = jnp.where(has, nlo, ext_lo)
            ext_hi = jnp.where(has, nhi, ext_hi)
            if cfg.use_lm:
                ext_node = jnp.where(has, dev["trie_next"][ext_node, cid_b], ext_node)
            if cfg.use_hotwords:
                ext_hnode = jnp.where(has, hot["next"][ext_hnode, cid_b], ext_hnode)

        seed_lo = jnp.broadcast_to(tok_dev["seed_lo"][toks][None, :], (b, k))
        seed_hi = jnp.broadcast_to(tok_dev["seed_hi"][toks][None, :], (b, k))
        p_lo_n = jnp.where(
            stay, state["p_lo"][:, None], jnp.where(as_boundary, seed_lo, ext_lo)
        )
        p_hi_n = jnp.where(
            stay, state["p_hi"][:, None], jnp.where(as_boundary, seed_hi, ext_hi)
        )
        p_len_n = jnp.where(
            stay,
            state["p_len"][:, None],
            jnp.where(
                as_boundary,
                tok_plen[None, :],
                state["p_len"][:, None] + tok_rlen[None, :],
            ),
        )
        if cfg.use_lm:
            seed_node = jnp.broadcast_to(dev["seed_node_arr"][toks][None, :], (b, k))
            p_node_n = jnp.where(
                stay,
                state["p_node"][:, None],
                jnp.where(as_boundary, seed_node, ext_node),
            )
        else:
            p_node_n = jnp.zeros((b, k), dtype=jnp.int32)
        if cfg.use_hotwords:
            seed_hnode = jnp.broadcast_to(hot["seed"][toks][None, :], (b, k))
            h_node_n = jnp.where(
                stay,
                state["h_node"][:, None],
                jnp.where(as_boundary, seed_hnode, ext_hnode),
            )
        else:
            h_node_n = None

        text_lo_n = jnp.where(
            as_boundary, cm["text_lo"][:, None], state["text_lo"][:, None]
        )
        text_hi_n = jnp.where(
            as_boundary, cm["text_hi"][:, None], state["text_hi"][:, None]
        )
        fused_n = state["fused"][:, None] + jnp.where(
            as_boundary, cm["word_fused"][:, None], 0.0
        )
        ctx_n = jnp.where(
            as_boundary[:, :, None], cm["ctx"][:, None, :], state["ctx"][:, None, :]
        )
        ctx_len_n = jnp.where(as_boundary, cm["ctx_len"][:, None], state["ctx_len"][:, None])
        ring_lo_n = jnp.where(
            as_boundary[:, :, None], cm["ring_lo"][:, None, :], state["ring_lo"][:, None, :]
        )
        ring_hi_n = jnp.where(
            as_boundary[:, :, None], cm["ring_hi"][:, None, :], state["ring_hi"][:, None, :]
        )
        n_words_n = jnp.where(as_boundary, cm["n_words"][:, None], state["n_words"][:, None])
        last_n = jnp.broadcast_to(toks[None, :], (b, k)).astype(jnp.int32)
        force_n = jnp.where(as_boundary, tok_right[None, :], state["force"][:, None])
        logit_n = jnp.where(
            alive[:, None], state["logit"][:, None] + tok_logp[None, :], DEAD
        )
        valid = alive[:, None] & admit[None, :]

        # ---- merge keys (token identity is implicit: merges are
        # block-diagonal per token column, see _merge_dense)
        kl = _mix_key(
            jnp,
            text_lo_n,
            p_lo_n,
            p_hi_n,
            force_n.astype(jnp.uint32),
        )
        kh = _mix_key(
            jnp,
            text_hi_n,
            p_hi_n,
            p_lo_n,
            force_n.astype(jnp.uint32),
        )

        fields = {
            "text_lo": _flatten(text_lo_n),
            "text_hi": _flatten(text_hi_n),
            "p_lo": _flatten(p_lo_n),
            "p_hi": _flatten(p_hi_n),
            "p_node": _flatten(p_node_n),
            "p_len": _flatten(p_len_n),
            "last_tok": _flatten(last_n),
            "force": _flatten(force_n),
            "fused": _flatten(fused_n),
            "ctx": _flatten(ctx_n),
            "ctx_len": _flatten(ctx_len_n),
            "ring_lo": _flatten(ring_lo_n),
            "ring_hi": _flatten(ring_hi_n),
            "n_words": _flatten(n_words_n),
            **({"h_node": _flatten(h_node_n)} if cfg.use_hotwords else {}),
        }

        # ---- block-diagonal merge: [K, B] layout
        to_kb = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        merged, dup, donor = _merge_dense(
            jnp, [to_kb(kl), to_kb(kh)], to_kb(valid), to_kb(logit_n)
        )
        src_flat = (
            jnp.arange(k, dtype=jnp.int32)[:, None] * b + donor
        ).reshape(c)
        rep = (to_kb(valid) & ~dup).reshape(c)
        merged_flat = jnp.where(rep, merged.reshape(c), DEAD)
        live = merged_flat > DEAD_THRESH

        if cfg.use_lm or cfg.use_hotwords:
            pscore = _partial_score(
                jnp,
                cfg,
                dev,
                hot,
                prm,
                fields["p_node"][src_flat],
                fields["h_node"][src_flat] if cfg.use_hotwords else None,
                fields["p_len"][src_flat],
            )
            extra = fields["fused"][src_flat] + pscore
        else:
            extra = fields["fused"][src_flat]
        lm_score_flat = jnp.where(live, merged_flat + extra, DEAD)

        top_scores, top_logit, src = _rank(
            jnp, cfg, lm_score_flat, merged_flat, src_flat, prm["beam_prune_logp"]
        )
        sel_alive = top_scores > DEAD_THRESH
        parent = (src % b).astype(jnp.int32)
        token_sel = toks[src // b].astype(jnp.int32)

        new_state = {key: fields[key][src] for key in fields}
        new_state["logit"] = jnp.where(sel_alive, top_logit, DEAD)
        new_state["last_tok"] = jnp.where(
            sel_alive, new_state["last_tok"], -2 - jnp.arange(b, dtype=jnp.int32)
        )

        if cfg.prune_history:
            hk = [
                new_state["p_lo"],
                new_state["p_hi"],
                new_state["last_tok"].astype(jnp.uint32),
                jnp.minimum(new_state["n_words"], cfg.ring_width).astype(jnp.uint32),
            ]
            hk += [new_state["ring_lo"][:, i] for i in range(cfg.ring_width)]
            hk += [new_state["ring_hi"][:, i] for i in range(cfg.ring_width)]
            eq = jnp.ones((b, b), dtype=bool)
            for f in hk:
                eq &= f[:, None] == f[None, :]
            lower = jnp.tril(jnp.ones((b, b), dtype=bool), k=-1)
            dup = jnp.any(eq & lower, axis=1)
            new_state["logit"] = jnp.where(dup, DEAD, new_state["logit"])
            new_state["last_tok"] = jnp.where(
                dup, -2 - jnp.arange(b, dtype=jnp.int32), new_state["last_tok"]
            )

        # inactive (padded) frames pass state through untouched
        import jax as _jax

        out_state = _jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old), new_state, state
        )
        parent = jnp.where(active, parent, jnp.arange(b, dtype=jnp.int32))
        token_sel = jnp.where(active, token_sel, -1)
        return out_state, (parent, token_sel)

    return step


def _finalize(jnp, cfg: EngineConfig, dev: Dict, hot: Dict, prm: Dict, state: Dict, do_commit, is_end):
    """Generalized finalization (ref decoder.py:558-602).

    ``do_commit`` / ``is_end`` are traced booleans:

    * ``do_commit`` — force-commit trailing partial words and merge beams by
      text (``force_next_word`` / end-of-decode semantics);
    * ``is_end`` — score the final ``next_word`` (possibly the empty word,
      which KenLM treats as <unk>) with ``is_last_word=True`` (</s> credit
      when ``score_boundary``).

    Returns ranked outputs plus the committed carried state (meaningful when
    ``do_commit`` is set) for the streaming API.
    """
    b = cfg.beam_width
    alive = state["logit"] > DEAD_THRESH
    has_partial = state["p_len"] > 0
    commit = has_partial & do_commit
    if cfg.use_hotwords:
        hot_gain = prm["hot_weight"] * (
            hot["is_word"][state["h_node"]] & commit
        ).astype(jnp.float32)
    else:
        hot_gain = jnp.zeros_like(state["fused"])
    t_lo, t_hi = hash_text_commit(
        jnp, state["text_lo"], state["text_hi"], state["p_lo"], state["p_hi"]
    )
    text_lo = jnp.where(commit, t_lo, state["text_lo"])
    text_hi = jnp.where(commit, t_hi, state["text_hi"])
    ring_lo_push = jnp.concatenate(
        [state["ring_lo"][:, 1:], state["p_lo"][:, None]], axis=1
    )
    ring_hi_push = jnp.concatenate(
        [state["ring_hi"][:, 1:], state["p_hi"][:, None]], axis=1
    )
    ring_lo = jnp.where(commit[:, None], ring_lo_push, state["ring_lo"])
    ring_hi = jnp.where(commit[:, None], ring_hi_push, state["ring_hi"])
    n_words = state["n_words"] + commit.astype(jnp.int32)

    if cfg.use_lm:
        # the word scored at finalization: the committed partial, or the
        # empty word (<unk>) when nothing commits but the stream ends
        score_word = is_end | commit
        node = state["p_node"]
        wid_raw = dev["trie_word_id"][node]
        in_model = (wid_raw >= 0) & commit
        wid = jnp.where(in_model, wid_raw, dev["unk_id"])
        in_uni = dev["trie_is_uni_word"][node] & commit
        is_oov = (dev["has_unigrams"] & ~in_uni) | ~in_model
        raw10, ctx2, ctx2_len = lm_score_words_jnp(
            dev, cfg.order, dev["unk_prob10"], state["ctx"], state["ctx_len"], wid
        )
        eos = jnp.full((b,), dev["eos_id"], dtype=jnp.int32)
        eos10, _, _ = lm_score_words_jnp(
            dev, cfg.order, dev["unk_prob10"], ctx2, ctx2_len, eos
        )
        raw = raw10 + prm["unk_offset"] * is_oov.astype(jnp.float32)
        raw = raw + jnp.where(is_end & prm["score_boundary"], eos10, 0.0)
        word_fused = prm["alpha"] * raw * np.float32(LOG_BASE_CHANGE_FACTOR) + prm["beta"]
        fused_scored = state["fused"] + jnp.where(score_word, word_fused, 0.0) + hot_gain
        ctx_view = jnp.where(score_word[:, None], ctx2, state["ctx"])
        ctx_len_view = jnp.where(score_word, ctx2_len, state["ctx_len"])
        ctx_carry = jnp.where(commit[:, None], ctx2, state["ctx"])
        ctx_len_carry = jnp.where(commit, ctx2_len, state["ctx_len"])
    else:
        fused_scored = state["fused"] + hot_gain
        ctx_view = ctx_carry = state["ctx"]
        ctx_len_view = ctx_len_carry = state["ctx_len"]
    pscore = _partial_score(
        jnp,
        cfg,
        dev,
        hot,
        prm,
        state["p_node"],
        state["h_node"] if cfg.use_hotwords else None,
        state["p_len"],
    )

    # partials survive (and keep their score) only when not committing
    extra = fused_scored + jnp.where(do_commit, 0.0, pscore)

    # merge key: text only when committed; full beam key otherwise
    u0 = jnp.uint32(0)
    p_lane_lo = jnp.where(do_commit, u0, state["p_lo"])
    p_lane_hi = jnp.where(do_commit, u0, state["p_hi"])
    last_lane = jnp.where(
        do_commit, jnp.uint32(1), (state["last_tok"] + 2).astype(jnp.uint32)
    )
    force_lane = jnp.where(do_commit, False, state["force"]).astype(jnp.uint32)
    kl = _mix_key(jnp, text_lo, p_lane_lo, last_lane, force_lane)
    kh = _mix_key(jnp, text_hi, p_lane_hi, last_lane, force_lane)
    logit_f = jnp.where(alive, state["logit"], DEAD)

    merged, dup, donor = _merge_dense(
        jnp, [kl[None, :], kh[None, :]], alive[None, :], logit_f[None, :]
    )
    rep = alive & ~dup[0]
    merged_b = jnp.where(rep, merged[0], DEAD)
    live = merged_b > DEAD_THRESH
    lm_score = jnp.where(live, merged_b + extra[donor[0]], DEAD)
    score, logit, src = _rank(
        jnp, cfg, lm_score, merged_b, donor[0], prm["beam_prune_logp"]
    )
    sel_alive = score > DEAD_THRESH

    committed_state = {
        "text_lo": text_lo[src],
        "text_hi": text_hi[src],
        "p_lo": jnp.zeros((b,), dtype=jnp.uint32),
        "p_hi": jnp.zeros((b,), dtype=jnp.uint32),
        "p_node": jnp.zeros((b,), dtype=jnp.int32),
        "p_len": jnp.zeros((b,), dtype=jnp.int32),
        "last_tok": jnp.where(sel_alive, -1, -2 - jnp.arange(b, dtype=jnp.int32)),
        "force": jnp.zeros((b,), dtype=bool),
        "logit": jnp.where(sel_alive, logit, DEAD),
        "fused": fused_scored[src],
        "ctx": ctx_carry[src],
        "ctx_len": ctx_len_carry[src],
        "ring_lo": ring_lo[src],
        "ring_hi": ring_hi[src],
        "n_words": n_words[src],
        **({"h_node": jnp.zeros((b,), dtype=jnp.int32)} if cfg.use_hotwords else {}),
    }
    return {
        "src": src,
        "logit": logit,
        "score": score,
        "ctx": ctx_view[src],
        "ctx_len": ctx_len_view[src],
        "committed_state": committed_state,
    }


def make_decode_fn(
    cfg: EngineConfig,
    tokens: TokenArrays,
    device_lm: Optional[DeviceLM],
):
    """Build the jittable one-utterance decode function.

    ``fn(logp [T,V] f32, n_frames i32, params [6] f32, start_ctx [ctx_w] i32,
    start_ctx_len i32)`` returns final ranked beams plus per-frame
    backpointers for host-side reconstruction.
    """
    import jax
    import jax.numpy as jnp

    tok_dev, dev = _build_dev_tables(jnp, tokens, device_lm)

    def decode(logp, n_frames, params, start_ctx, start_ctx_len, hot=None):
        """Full-utterance decode: scan all frames, then finalize."""
        prm = _params_dict(params)
        state0 = _init_state(jnp, cfg, start_ctx, start_ctx_len)
        step = _make_step(jnp, cfg, tok_dev, dev, hot, prm, n_frames)
        t_idx = jnp.arange(logp.shape[0], dtype=jnp.int32)
        final_state, (parents, trace) = jax.lax.scan(step, state0, (logp, t_idx))
        fin = _finalize(
            jnp, cfg, dev, hot, prm, final_state, jnp.bool_(True), jnp.bool_(True)
        )
        return {
            "parents": parents,
            "trace": trace,
            "beam_src": fin["src"],
            "logit": fin["logit"],
            "lm_score": fin["score"],
            "ctx": fin["ctx"],
            "ctx_len": fin["ctx_len"],
        }

    return decode


def make_stream_fns(
    cfg: EngineConfig,
    tokens: TokenArrays,
    device_lm: Optional[DeviceLM],
):
    """Build streaming primitives with a device-resident carried state.

    Returns ``(init_fn, chunk_fn, finalize_fn)``:

    * ``init_fn(start_ctx, start_ctx_len) -> state``
    * ``chunk_fn(state, logp [Tc,V], n_frames, params) ->
      (state', parents [Tc,B], trace [Tc,B])``
    * ``finalize_fn(state, params, do_commit f32, is_end f32) -> outputs``
      (ranked view of the current hypotheses plus the committed carried
      state; ``do_commit``/``is_end`` are traced so one compilation serves
      every streaming mode).
    """
    import jax
    import jax.numpy as jnp

    tok_dev, dev = _build_dev_tables(jnp, tokens, device_lm)

    def init_fn(start_ctx, start_ctx_len):
        return _init_state(jnp, cfg, start_ctx, start_ctx_len)

    def chunk_fn(state, logp, n_frames, params, hot=None):
        """Scan one logit chunk, returning the new state and backpointers."""
        prm = _params_dict(params)
        step = _make_step(jnp, cfg, tok_dev, dev, hot, prm, n_frames)
        t_idx = jnp.arange(logp.shape[0], dtype=jnp.int32)
        state1, (parents, trace) = jax.lax.scan(step, state, (logp, t_idx))
        return state1, parents, trace

    def finalize_fn(state, params, do_commit, is_end, hot=None):
        """Rank the current hypotheses (traced commit/eos flags)."""
        prm = _params_dict(params)
        return _finalize(
            jnp, cfg, dev, hot, prm, state, do_commit > 0.5, is_end > 0.5
        )

    return init_fn, chunk_fn, finalize_fn
