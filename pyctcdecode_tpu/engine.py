"""TPU device engine: fixed-width vectorized CTC beam search under ``lax.scan``.

This is the performance path of the framework. Where the reference walks
Python dataclass beams through dict merges and per-word C++ LM callbacks
(ref ``decoder.py:426-556``), this engine keeps the *entire* beam state as
fixed-shape device arrays and runs the per-frame pipeline

    expand (B beams x K tokens, masked 4-way transition)
    -> merge (block-diagonal dense logsumexp, see _merge_dense)
    -> LM fuse (device n-gram hash tables + vocab tries, per-beam commit)
    -> window prune -> top-k -> optional history prune

as one fused XLA program, scanned over frames. Text never exists on device:
beams are 2x32-bit rolling hashes plus trie nodes, and each frame emits a
``(parent, token)`` backpointer pair; transcripts and word-level frame spans
are reconstructed on host by backtracing and replaying the transition
system (identical rules to the host engine, which is the parity oracle).

Language models are a *list* of members (1 for a plain LM; N for
:class:`~pyctcdecode_tpu.models.language_model.MultiLanguageModel`, whose
fused word scores average over members, ref ``language_model.py:455-502``).
Each member carries its own context word-ids, vocab trie node, and fusion
parameters per beam.

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
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .constants import AVG_TOKEN_LEN, LOG_BASE_CHANGE_FACTOR
from .models.device_tables import (
    HOT_MINCOMP_MAX,
    HOT_MINCOMP_SHIFT,
    HOT_NODE_MASK,
    HOT_WORD_BIT,
    DeviceLM,
    lm_score_words_jnp,
    mark_empty_fp_rows,
    trie_fetch_rows,
)

# packed vocab-trie entry bits (see DeviceLM.as_device)
_NODE_MASK = DeviceLM.NODE_MASK
_BIT_IN_VOCAB = DeviceLM.BIT_IN_VOCAB
_BIT_UNI_WORD = DeviceLM.BIT_UNI_WORD
_BIT_UNI_PREFIX = DeviceLM.BIT_UNI_PREFIX
from .ops.hashing import hash_extend_char, hash_text_commit, mix4
from .ops.tokens import KIND_BLANK, KIND_BOUNDARY, TokenArrays

DEAD = -1.0e30
DEAD_THRESH = -1.0e29


def _shard_rows(size: int, n_shards: int) -> int:
    """Per-shard row count of a sharded table plane (ceil split).

    Single source of truth: ``build_table_args`` reshapes the bucket
    plane with it and ``build_table_meta`` bakes it into the collective
    probe's ownership math — the two MUST agree exactly.
    """
    return -(-size // n_shards)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (compile-time) decode configuration."""

    beam_width: int
    vocab_size: int
    k_tokens: int  # tokens expanded per frame (== vocab_size: exact parity)
    is_bpe: bool
    use_lm: bool
    order: int  # max member order (1 when no LM); sets history-prune window
    prune_history: bool
    use_hotwords: bool = False
    orders: Tuple[int, ...] = ()  # per-member orders; defaults to (order,)
    # backtrace the top-N beams on device and emit token paths instead of
    # raw [T, B] backpointer matrices (slashes device->host transfer for
    # top-1 decoding); None emits the full pointers
    emit_paths: Optional[int] = None
    # rank candidates with TPU's PartialReduce-based approx_max_k instead
    # of the full sort lax.top_k lowers to. With recall_target=1.0 the
    # top-k SET is exact and a re-sort restores enumeration tie order
    # within it; only exact-score ties ACROSS the selection boundary may
    # pick a different (equal-scoring) member than the reference — opt-in
    # for serving, off for parity work.
    fast_topk: bool = False
    # accumulate per-utterance decode counters (beams alive, prune/merge
    # kills, commits, LM probe hit rates) in the carried state; off by
    # default so the hot program is unchanged. See stats_fields().
    collect_stats: bool = False
    # decode host-built token timelines (utils.logits.token_timeline):
    # each step processes one K-wide CHUNK of a frame's exactly-admitted
    # token set against a carried candidate pool, promoting the pool to
    # the beam set on the frame's last chunk. Output-exact for ANY
    # k_tokens (admission is exact by construction; merges are confined
    # to one applied-token column so chunks never split a merge group,
    # and iterated top-B over pool ∪ chunk equals the frame's top-B) —
    # k_tokens becomes a pure throughput knob sized to the MEAN admitted
    # count instead of the batch-worst frame.
    token_timeline: bool = False

    @property
    def lm_orders(self) -> Tuple[int, ...]:
        """Per-LM-member n-gram orders (empty when no LM)."""
        if not self.use_lm:
            return ()
        return self.orders if self.orders else (self.order,)

    @property
    def n_lms(self) -> int:
        """Number of LM members (0 without an LM)."""
        return len(self.lm_orders)

    def ctx_w(self, i: int) -> int:
        """Context width of member ``i``."""
        return max(self.lm_orders[i] - 1, 1)

    @property
    def ring_width(self) -> int:
        return max(self.order - 1, 1)


def stats_fields(cfg: EngineConfig) -> List[str]:
    """Names of the decode counters, in state["stats"] vector order.

    All counters are sums over decoded (active) frames of per-frame
    counts; divide by the frame count for rates. ``probe_hits_o{n}`` /
    ``probe_queries`` give the order-``n`` full-suffix LM probe hit rate
    of per-frame commit scoring, aggregated over LM members (SURVEY §5.5
    observability).

    Under ``token_timeline`` (the serving configuration) the same vector
    is produced with these semantics: per-chunk work counters
    (``beams_alive``, ``candidates_valid``, ``merged_dups``,
    ``probe_queries``, ``probe_hits_*``) accumulate over VIRTUAL steps
    (chunks, ~1.1x frames at serving chunk widths), while frame-shaped
    counters (``frames``, ``window_pruned``, ``selected_alive``,
    ``history_pruned``, ``words_committed``) count only each frame's
    final chunk — so per-frame rates read identically to dense mode.
    """
    names = [
        "frames",
        "beams_alive",
        "candidates_valid",
        "merged_dups",
        "window_pruned",
        "selected_alive",
        "history_pruned",
        "words_committed",
    ]
    if cfg.n_lms:
        names.append("probe_queries")
        for n in range(1, max(cfg.lm_orders) + 1):
            names.append(f"probe_hits_o{n}")
    return names


def _normalize_members(
    device_lms: Union[None, DeviceLM, Sequence[DeviceLM]],
) -> List[DeviceLM]:
    if device_lms is None:
        return []
    if isinstance(device_lms, DeviceLM):
        return [device_lms]
    return list(device_lms)


def build_table_args(
    jnp: "object",
    tokens: TokenArrays,
    device_lms: Union[None, DeviceLM, Sequence[DeviceLM]],
    shard: Optional[Tuple[str, int]] = None,
) -> Dict:
    """Device arrays passed as *runtime inputs* to the compiled decode.

    Embedding multi-hundred-MB LM tables as HLO constants bloats the
    executable (and breaks remote-compile payload limits), so every large
    array rides as an argument; only shape-relevant scalars stay static
    (see :func:`build_table_meta`). Build once per decoder and reuse.

    ``shard=(axis_name, n_shards)`` row-shards each n-gram table's bucket
    plane for a mesh whose HBM cannot hold the whole LM: ``bucket``
    becomes ``[n_shards, ceil(size/n_shards), W]`` — non-dividing sizes
    pad with never-owned empty-sentinel rows (bucketized placement means
    no halo is needed) — to be fed through ``shard_map`` with the leading
    axis partitioned. Sharded planes stay as numpy so jit places each
    block directly on its shard's device.
    """
    tok = {
        "kind": jnp.asarray(tokens.kind),
        "piece_len": jnp.asarray(tokens.piece_len),
        "raw_chars": jnp.asarray(tokens.raw_chars),
        "raw_len": jnp.asarray(tokens.raw_len),
        "right_bound": jnp.asarray(tokens.right_bound),
        "seed_lo": jnp.asarray(tokens.seed_hash_lo),
        "seed_hi": jnp.asarray(tokens.seed_hash_hi),
    }
    lms = []
    for dlm in _normalize_members(device_lms):
        dev = dlm.as_device(include_fp=shard is None)
        if shard is None:
            fp = [
                {
                    "bucket": t["bucket"],
                    "seed_lo": t["seed_lo"],
                    "seed_hi": t["seed_hi"],
                }
                for t in dev["fp"]
            ]
        else:
            _, n_shards = shard
            fp = []
            for t in dlm.fp_tables:
                rows = _shard_rows(t.size, n_shards)  # pad odd splits
                plane = t.bucket
                pad = n_shards * rows - t.size
                if pad:
                    # padding rows are never owned (bucket indices stay
                    # < size) and their fp lanes are the empty sentinel,
                    # so a stray gather of one can never match a query
                    empty = np.zeros((pad, plane.shape[1]), dtype=np.uint32)
                    mark_empty_fp_rows(empty)
                    plane = np.concatenate(
                        [plane, empty.view(np.int32)], axis=0
                    )
                fp.append(
                    {
                        "bucket": plane.reshape(
                            n_shards, rows, plane.shape[1]
                        ),
                        "seed_lo": jnp.uint32(t.seed_lo),
                        "seed_hi": jnp.uint32(t.seed_hi),
                    }
                )
        lms.append(
            {
                "trie_rows": dev["trie_rows"],
                "trie_word_id": dev["trie_word_id"],
                "uni_unk_row": dev["uni_unk_row"],
                "seed_node_arr": dev["seed_node"],
                "uni": dev["uni"],
                "fp": fp,
            }
        )
    return {"tok": tok, "lms": lms}


def build_table_meta(
    device_lms: Union[None, DeviceLM, Sequence[DeviceLM]],
    shard: Optional[Tuple[str, int]] = None,
) -> List[Dict]:
    """Static per-member scalars (closed over by the compiled program).

    With ``shard=(axis_name, n_shards)`` each table's meta additionally
    records the mesh axis and its local row count, switching the device
    probe to the collective sharded path (see
    :func:`~pyctcdecode_tpu.models.device_tables._probe_fp_sharded`).
    """
    meta = []
    for dlm in _normalize_members(device_lms):
        fp_meta = []
        for t in dlm.fp_tables:
            one = {
                "size": t.size,
                "hash_mode": t.hash_mode,
            }
            if shard is not None:
                axis_name, n_shards = shard
                one.update(
                    shard_axis=axis_name,
                    n_shards=n_shards,
                    shard_rows=_shard_rows(t.size, n_shards),
                )
            fp_meta.append(one)
        meta.append(
            {
                "unk_id": dlm.unk_id,
                "eos_id": dlm.eos_id,
                "unk_prob10": np.float32(dlm.unk_prob10),
                "has_unigrams": dlm.has_unigrams,
                "fp_meta": fp_meta,
                # static cell-packing geometry of the trie plane (see
                # device_tables.trie_pack_params): the walk unpacks child
                # (rank | flags) cells with these shift constants
                "trie_pack": dlm.trie_pack,
            }
        )
    return meta


def _merge_tables(tabs, meta):
    """Per-call view: runtime arrays + static scalars as one dev dict."""
    devs = []
    for arrs, m in zip(tabs["lms"], meta):
        dev = dict(arrs)
        dev.update(m)
        dev["fp"] = [
            dict(t, **fm) for t, fm in zip(arrs["fp"], m["fp_meta"])
        ]
        devs.append(dev)
    return tabs["tok"], devs


def _params_dict(cfg: EngineConfig, params):
    """Unpack the traced parameter vector.

    Layout: ``[token_min_logp, beam_prune_logp, hot_weight,
    (alpha_i, beta_i, unk_offset_i, score_boundary_i) x n_lms]``.
    """
    out = {
        "token_min_logp": params[0],
        "beam_prune_logp": params[1],
        "hot_weight": params[2],
        "lm": [],
    }
    for i in range(cfg.n_lms):
        base = 3 + 4 * i
        out["lm"].append(
            {
                "alpha": params[base],
                "beta": params[base + 1],
                "unk_offset": params[base + 2],
                "score_boundary": params[base + 3] > 0.5,
            }
        )
    return out


def _init_state(jnp, cfg: EngineConfig, start):
    """Initial beam state.

    ``start`` is a per-LM-member tuple of dicts ``{"ctx": [ctx_w] i32,
    "len": i32, "bo": [ctx_w] f32}`` (context ids, length, and the context
    suffix backoffs, see :func:`lm_score_words_jnp`).
    """
    b = cfg.beam_width
    u32z = jnp.zeros((b,), dtype=jnp.uint32)
    i32 = functools.partial(jnp.zeros, (b,), dtype=jnp.int32)
    logit = jnp.full((b,), DEAD, dtype=jnp.float32).at[0].set(0.0)
    state = {
        "text_lo": u32z,
        "text_hi": u32z,
        "p_lo": u32z,
        "p_hi": u32z,
        "p_len": i32(),
        "last_tok": jnp.where(
            jnp.arange(b) == 0, -1, -2 - jnp.arange(b, dtype=jnp.int32)
        ).astype(jnp.int32),
        "force": jnp.zeros((b,), dtype=bool),
        "logit": logit,
        "fused": jnp.zeros((b,), dtype=jnp.float32),
        "ring_lo": jnp.zeros((b, cfg.ring_width), dtype=jnp.uint32),
        "ring_hi": jnp.zeros((b, cfg.ring_width), dtype=jnp.uint32),
        "n_words": i32(),
    }
    for i in range(cfg.n_lms):
        state[f"p_node{i}"] = i32()
        state[f"p_flags{i}"] = i32()  # packed entry bits of the current node
        state[f"ctx{i}"] = jnp.broadcast_to(
            start[i]["ctx"], (b, cfg.ctx_w(i))
        ).astype(jnp.int32)
        state[f"ctx_len{i}"] = jnp.broadcast_to(start[i]["len"], (b,)).astype(
            jnp.int32
        )
        state[f"ctx_bo{i}"] = jnp.broadcast_to(
            start[i]["bo"], (b, cfg.ctx_w(i))
        ).astype(jnp.float32)
    if cfg.use_hotwords:
        state["h_node"] = i32()
        state["h_bits"] = i32()  # packed hot entry (min-completion + terminal)
    if cfg.token_timeline:
        # carried candidate pool: the running top-B of the current frame's
        # merged candidates across its token chunks (see _make_step)
        iota = jnp.arange(b, dtype=jnp.int32)
        state["pool_score"] = jnp.full((b,), DEAD, dtype=jnp.float32)
        state["pool_logit"] = jnp.full((b,), DEAD, dtype=jnp.float32)
        state["pool_pf"] = iota  # first-member parent (transition replay)
        state["pool_pd"] = iota  # newest-member parent (backtrace donor)
        state["pool_tok"] = jnp.full((b,), -1, dtype=jnp.int32)
        for i in range(cfg.n_lms):
            state[f"pool_ent{i}"] = i32()  # packed trie entry of the cand
        if cfg.use_hotwords:
            state["pool_h"] = i32()
    if cfg.collect_stats:
        state["stats"] = jnp.zeros(
            (len(stats_fields(cfg)),), dtype=jnp.int32
        )
    return state


def _member_word_score(jnp, dev, lm_prm, order, trie_row, flags, ctx, ctx_len, ctx_bo, stats_out=None):
    """One member's fused word score + new context for a committed partial.

    ``flags`` are the node's packed entry bits carried on the beam, so OOV
    and vocab-membership checks cost no gathers; the word id rides in the
    last column of ``trie_row`` (the per-beam trie row the step already
    gathers for the child walk), so commit scoring adds no gather at all.
    ``ctx_bo`` carries the context's suffix backoffs, halving probe volume
    (see lm_score_words_jnp).
    """
    import jax

    in_model = (flags & _BIT_IN_VOCAB) != 0
    wid = jnp.where(in_model, trie_row[:, -1], dev["unk_id"])
    # the word's order-1 probe result rides the trie row (cols W-4..W-2);
    # non-vocab partials resolve as <unk>, whose unigram row is a constant
    unk = dev["uni_unk_row"]
    unk_e = unk[2] > 0.5
    f1 = jnp.where(in_model, trie_row[:, -2] != 0, unk_e)
    t_p = jax.lax.bitcast_convert_type(trie_row[:, -4], jnp.float32)
    t_b = jax.lax.bitcast_convert_type(trie_row[:, -3], jnp.float32)
    p1 = jnp.where(f1, jnp.where(in_model, t_p, unk[0]), 0.0)
    b1 = jnp.where(f1, jnp.where(in_model, t_b, unk[1]), 0.0)
    in_uni = (flags & _BIT_UNI_WORD) != 0
    is_oov = (dev["has_unigrams"] & ~in_uni) | ~in_model
    raw10, new_ctx, new_ctx_len, new_bo = lm_score_words_jnp(
        dev, order, dev["unk_prob10"], ctx, ctx_len, wid, ctx_bo,
        stats_out=stats_out, uni_probe=(f1, p1, b1),
    )
    raw10 = raw10 + lm_prm["unk_offset"] * is_oov.astype(jnp.float32)
    fused = lm_prm["alpha"] * raw10 * np.float32(LOG_BASE_CHANGE_FACTOR) + lm_prm["beta"]
    return fused, new_ctx, new_ctx_len, new_bo


def _commit_quantities(
    jnp, cfg: EngineConfig, devs: List[Dict], hot: Dict, prm: Dict, state: Dict,
    trie_rows: Optional[List] = None,
):
    """Per-beam word-commit effects (LM scores, contexts, text hash, hotwords).

    ``trie_rows`` passes each member's pre-gathered ``[B, W]`` trie rows
    (the step shares one gather between the child walk and the word-id
    read); when absent they are gathered here.
    """
    commit = state["p_len"] > 0
    if cfg.use_hotwords:
        # full-word hotword boost at commit (ref language_model.py:137-139:
        # weight x #matching words, accumulated incrementally)
        is_hot_word = (state["h_bits"] & HOT_WORD_BIT) != 0
        hot_gain = prm["hot_weight"] * (is_hot_word & commit).astype(jnp.float32)
    else:
        hot_gain = jnp.zeros_like(state["fused"])
    t_lo, t_hi = hash_text_commit(
        jnp, state["text_lo"], state["text_hi"], state["p_lo"], state["p_hi"]
    )
    out = {
        "commit": commit,
        "text_lo": jnp.where(commit, t_lo, state["text_lo"]),
        "text_hi": jnp.where(commit, t_hi, state["text_hi"]),
        "ring_lo": jnp.where(
            commit[:, None],
            jnp.concatenate([state["ring_lo"][:, 1:], state["p_lo"][:, None]], axis=1),
            state["ring_lo"],
        ),
        "ring_hi": jnp.where(
            commit[:, None],
            jnp.concatenate([state["ring_hi"][:, 1:], state["p_hi"][:, None]], axis=1),
            state["ring_hi"],
        ),
        "n_words": state["n_words"] + commit.astype(jnp.int32),
    }
    fused_sum = jnp.zeros_like(state["fused"])
    probe_hits: List[List] = []  # per member, per order: [B] bool hit masks
    for i, (dev, order) in enumerate(zip(devs, cfg.lm_orders)):
        row_i = (
            trie_rows[i]
            if trie_rows is not None
            else trie_fetch_rows(
                jnp, dev["trie_rows"], dev["trie_pack"], state[f"p_node{i}"]
            )
        )
        member_stats: Optional[Dict] = {} if cfg.collect_stats else None
        fused_i, new_ctx, new_ctx_len, new_bo = _member_word_score(
            jnp,
            dev,
            prm["lm"][i],
            order,
            row_i,
            state[f"p_flags{i}"],
            state[f"ctx{i}"],
            state[f"ctx_len{i}"],
            state[f"ctx_bo{i}"],
            stats_out=member_stats,
        )
        if cfg.collect_stats:
            probe_hits.append(member_stats.get("hits", []))
        fused_sum = fused_sum + fused_i
        out[f"ctx{i}"] = jnp.where(commit[:, None], new_ctx, state[f"ctx{i}"])
        out[f"ctx_len{i}"] = jnp.where(commit, new_ctx_len, state[f"ctx_len{i}"])
        out[f"ctx_bo{i}"] = jnp.where(commit[:, None], new_bo, state[f"ctx_bo{i}"])
    if cfg.n_lms:
        word_fused = jnp.where(commit, fused_sum / cfg.n_lms, 0.0)
    else:
        word_fused = jnp.zeros_like(state["fused"])
    out["word_fused"] = word_fused + hot_gain
    if cfg.collect_stats:
        out["probe_hits"] = probe_hits
    return out


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
    lead = keys[0].shape[:-1]
    # (round 5: padding the reduced j axis to a full 128-lane multiple —
    # so the sweeps never idle lanes at B=100 — measured 1,419 -> 1,806 ms
    # busy: the pad operands broke the reductions' fusion with the
    # upstream key compares. Do not retry.)
    eq = valid[..., :, None] & valid[..., None, :]
    for f in keys:
        eq = eq & (f[..., :, None] == f[..., None, :])
    # Flatten every leading dim (token columns x whatever vmap adds) into
    # the reduction's sublane axis: reductions over [.., K, B, B] tempt
    # XLA into laying the output out with the small K axis on the
    # 128-wide lane dimension (measured: K=8 leaves 94% of the lanes
    # idle and the merge fusion runs ~11x slower than the K=4 layout
    # that keeps a big axis minor-most). [K*B, B] keeps the lane axis
    # >= 128 wide for any K. The reshapes are metadata-only.
    eq2 = eq.reshape((-1, b) if not lead else lead[:-1] + (lead[-1] * b, b))
    # (round 4: materializing eq2 once behind an optimization_barrier —
    # to stop the four reductions re-deriving the mask — measured ~1.7x
    # SLOWER end-to-end: the forced pred layout broke the reductions'
    # beam-minor layout, hitting the same ~11x reduce pathology the
    # [K, B] transpose barrier above exists to avoid. The re-derived
    # compares are the cheaper evil; do not retry.)
    idx = jnp.arange(b, dtype=jnp.int32)
    lj = jnp.broadcast_to(logit[..., None, :], eq.shape).reshape(eq2.shape)
    ij = jnp.broadcast_to(idx, eq.shape).reshape(eq2.shape)
    # four independent masked reductions over the flattened mask: group
    # max logit, newest member (donor), oldest member (first), exp-sum.
    # Two lowering rules learned from per-op profiles on v5e:
    # * a single variadic jax.lax.reduce computing the tuple at once
    #   looks cheaper but lowers to a ~9x slower tuple-reduction fusion
    #   (the round-2 "fold into one variadic pass" change was a 3x
    #   end-to-end regression, deliberately reverted);
    # * INTEGER max/min reduces over the mask lower to ~3x slower
    #   fusions than float select+reduce (14 ms vs 4.2 ms per frame at
    #   batch 168, B=100, K=8), so the index reductions run in f32 —
    #   exact for any index below 2^24 — and cast back.
    fj = ij.astype(jnp.float32)
    m = jnp.max(jnp.where(eq2, lj, -jnp.inf), axis=-1)
    donor_f = jnp.max(jnp.where(eq2, fj, -1.0), axis=-1)
    # (round 5: replacing this min-reduce with a masked pred-ANY over the
    # strictly-lower-triangular pattern — the history prune's trick —
    # measured 1,436 -> 1,480 ms busy end-to-end; the extra [KB, B] mask
    # operand costs more than the f32 min it saves. Keep the min.)
    first_f = jnp.min(jnp.where(eq2, fj, float(b)), axis=-1)
    tot = jnp.sum(jnp.where(eq2, jnp.exp(lj - m[..., None]), 0.0), axis=-1)
    out_shape = lead + (b,)
    m = m.reshape(out_shape)
    donor = donor_f.astype(jnp.int32).reshape(out_shape)
    first = first_f.astype(jnp.int32).reshape(out_shape)
    merged = m + jnp.log(tot).reshape(out_shape)
    dup = first < idx  # an older (j < i) member of my group exists
    return merged, dup, jnp.maximum(donor, 0)


def _select_fields_mxu(
    jnp,
    fields: Dict,
    src,
    n_candidates: int,
    n_chunks: Optional[Dict] = None,
    token_factor: Optional[Tuple] = None,
):
    """Select per-candidate fields at ``src`` with one one-hot matmul.

    TPU gathers cost ~14-60 ns per gathered row regardless of width, which
    makes per-field row gathers the selection bottleneck; a one-hot [B, C]
    matrix times a packed [C, F] field matrix does the same permutation on
    the MXU in microseconds. Exactness: every 32-bit field is bitcast to
    u32 and split into four 8-bit chunks stored as bf16 (bf16 represents
    every integer up to 256 exactly), so each product (one-hot 1.0/0.0
    times a chunk <= 255) is exact, the row sum touches exactly one
    nonzero, and the chunks recombine losslessly. The operand matrix is
    the selection step's main HBM traffic, so bf16 storage halves it
    relative to f32 chunks at identical results (measured, bit-equal).

    ``n_chunks`` optionally narrows a field to its low ``n * 8`` bits
    (e.g. 1 for flags, 2 for small counters) — the operand matrix is the
    selection step's main HBM traffic, so dropping always-zero chunk
    columns is a direct bandwidth saving. Callers own the width claim.

    ``token_factor=(tok_col, k, b)`` selects from token-major [K*B]-flat
    candidate fields by the FACTORED index ``tok_col * b + src`` instead of
    a flat one-hot: a [K*B]-wide one-hot matrix is itself the dominant HBM
    traffic of a flat candidate select, while the factored form contracts
    the beam axis with the (shared, [B, B]) parent one-hot on the MXU and
    resolves the tiny token axis with a masked reduction. Exactness holds
    as in the flat path: each (r, winner) output sums exactly one nonzero
    product of exact-in-bf16 values.
    """
    import jax

    def to_u32(arr):
        if arr.dtype == jnp.float32:
            return jax.lax.bitcast_convert_type(arr, jnp.uint32)
        if arr.dtype == jnp.bool_:
            return arr.astype(jnp.uint32)
        return arr.astype(jnp.uint32)

    shifts = (0, 8, 16, 24)
    # flatten every field (and every column of 2-D fields) into f32 chunk
    # ROWS of a [F, C] matrix: with candidates minor the contracted dim is
    # already minor-most, so the matmul consumes the operand without the
    # whole-matrix relayout copy a [C, F] build incurs (measured ~23 ms
    # per parity-config batch).
    layout = []  # (key, n_cols_in_field, n_chunks)
    chunk_rows = []
    for key, arr in fields.items():
        bits = to_u32(arr)
        if bits.ndim == 1:
            bits = bits[:, None]
        nc = (n_chunks or {}).get(key, 4)
        layout.append((key, bits.shape[1], nc))
        cols = jnp.swapaxes(bits, 0, 1)  # [width, C]
        for shift in shifts[:nc]:
            chunk_rows.append(
                ((cols >> shift) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
            )
    big = jnp.concatenate(chunk_rows, axis=0)  # [sum(nc_f * cols_f), C]
    onehot = (
        src[:, None] == jnp.arange(n_candidates, dtype=src.dtype)[None, :]
    ).astype(jnp.bfloat16)  # [B, C] (or [B, B] parent one-hot when factored)
    if token_factor is None:
        picked = jax.lax.dot_general(
            onehot,
            big,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, n_rows(big)]
    else:
        tok_col, kf, bf = token_factor
        big3 = big.reshape(big.shape[0], kf, bf)
        # contract the beam axis: G[r, t, w] = field_chunk[r, t, parent_w]
        g = jax.lax.dot_general(
            big3,
            onehot,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, K, B_winners]
        # resolve the token axis: one nonzero per (r, winner)
        tok_mask = (
            jnp.arange(kf, dtype=tok_col.dtype)[:, None] == tok_col[None, :]
        ).astype(jnp.float32)  # [K, B_winners]
        picked = jnp.swapaxes(jnp.sum(g * tok_mask[None], axis=1), 0, 1)
    out = {}
    col = 0
    for key, width, nc in layout:
        val = jnp.zeros((picked.shape[0], width), dtype=jnp.uint32)
        for i, shift in enumerate(shifts[:nc]):
            chunk = picked[:, col + i * width : col + (i + 1) * width]
            val = val | (chunk.astype(jnp.uint32) << shift)
        col += nc * width
        dtype = fields[key].dtype
        if dtype == jnp.float32:
            val = jax.lax.bitcast_convert_type(val, jnp.float32)
        elif dtype == jnp.bool_:
            val = val != 0
        elif dtype != jnp.uint32:
            val = jax.lax.bitcast_convert_type(val, jnp.int32)
        out[key] = val[:, 0] if fields[key].ndim == 1 else val
    return out


def _token_cols(jnp, tables: Dict, tok_col, k: int) -> Dict:
    """Winner-indexed token-plane lookups without gathers.

    ``tables`` maps name -> [K]-shaped per-token array; ``tok_col`` is the
    [B] winner token-column vector. Indexing a tiny [K] table with per-beam
    indices (``tab[tok_col]``) lowers on TPU to a scalar-core gather at
    ~0.4 ms per lookup per step at decode shapes — ~10 such lookups made
    the transition replay over half of the whole step's device time. A
    shared [B, K] one-hot mask with a where/sum (or any) reduction is pure
    VPU work and bit-exact: exactly one mask lane is set per row, so the
    sum touches a single addend and booleans reduce by ``any``.
    """
    mask = tok_col[:, None] == jnp.arange(k, dtype=tok_col.dtype)[None, :]
    out = {}
    for name, tab in tables.items():
        if tab.dtype == jnp.bool_:
            out[name] = jnp.any(mask & tab[None, :], axis=1)
        else:
            zero = jnp.zeros((), dtype=tab.dtype)
            out[name] = jnp.sum(
                jnp.where(mask, tab[None, :], zero), axis=1, dtype=tab.dtype
            )
    return out


def _decode_trie_cells(jnp, jax, tp, fc, word, cid):
    """Packed trie cell -> packed child entry (node id | ``BIT_*`` flags).

    The trie plane stores children as small cells — ``rank`` among the
    node's BFS-contiguous children plus the child's 3 flag bits — packed
    ``cpw`` per i32 word (see ``device_tables.trie_pack_params``). This
    decodes the cell for char ``cid`` out of its packed ``word``:
    ``child = first_child + rank``; an all-ones rank means no child and
    resolves to the dead node with zero flags, exactly like the old
    full-width rows. Pure elementwise VPU work — the plane shrink that
    round 4's radix experiment bought with ~520 ms of per-step edge
    bookkeeping costs three shifts here.

    ``fc``: first-child ids broadcastable to ``word``'s shape; ``word``:
    the packed cell words; ``cid``: char ids, same shape as ``word``.
    """
    rb, cpw = tp["rb"], tp["cpw"]
    bpc = rb + 3
    shift = ((cid % cpw) * bpc).astype(jnp.uint32)
    wu = jax.lax.bitcast_convert_type(word, jnp.uint32)
    cell = (wu >> shift) & jnp.uint32((1 << bpc) - 1)
    rank = (cell & jnp.uint32((1 << rb) - 1)).astype(jnp.int32)
    flags3 = (cell >> jnp.uint32(rb)).astype(jnp.int32) & 7
    # cell flag bit order matches the packed-entry layout: bit0 ->
    # BIT_IN_VOCAB (1 << 28), bit1 -> BIT_UNI_WORD, bit2 -> BIT_UNI_PREFIX
    entry = (fc + rank) | (flags3 << 28)
    return jnp.where(rank == (1 << rb) - 1, tp["dead"], entry)


def _path_dtype(jnp, vocab_size: int):
    """Narrowest signed dtype for emitted token ids (+ -1/-2/-3 sentinels).

    The device->host link is the scarce resource for batch decoding
    (low-MB/s through the relay), and the backpointer/path planes are its
    dominant payload — int8 quarters the bytes for char alphabets at
    identical values.
    """
    if vocab_size <= 120:
        return jnp.int8
    if vocab_size <= 32_000:
        return jnp.int16
    return jnp.int32


def _parent_dtype(jnp, beam_width: int):
    """Narrowest signed dtype for emitted parent (beam-slot) indices."""
    if beam_width <= 127:
        return jnp.int8
    if beam_width <= 32_767:
        return jnp.int16
    return jnp.int32


def _rank(jnp, cfg, lm_score_flat, logit_flat, src_flat, beam_prune_logp):
    """Window prune relative to the best, then top-k (ref decoder.py:536-554)."""
    import jax

    mx = jnp.max(lm_score_flat)
    keep = lm_score_flat >= mx + beam_prune_logp
    sc = jnp.where(keep, lm_score_flat, DEAD)
    top_scores, top_idx = jax.lax.top_k(sc, cfg.beam_width)
    return top_scores, logit_flat[top_idx], src_flat[top_idx]


def _partial_score(jnp, cfg, hot, prm, flag_list, h_node, h_bits, plen):
    """score_partial_token for in-progress words — gather-free.

    All membership facts ride on the candidates' packed flag bits.
    Hotword-prefix partials use the hotword completion score
    (ref decoder.py:410-418, language_model.py:141-150); everything else
    uses the (member-averaged) LM unknown-prefix penalty
    (ref language_model.py:326-336, 478-481).
    """
    plen_f = plen.astype(jnp.float32)
    if cfg.n_lms:
        acc = None
        for i in range(cfg.n_lms):
            is_pref = (flag_list[i] & _BIT_UNI_PREFIX) != 0
            punk = prm["lm"][i]["unk_offset"] * (~is_pref).astype(jnp.float32)
            punk = jnp.where(plen > AVG_TOKEN_LEN, punk * plen_f / AVG_TOKEN_LEN, punk)
            acc = punk if acc is None else acc + punk
        lm_part = jnp.where(plen > 0, acc / cfg.n_lms, 0.0)
    else:
        lm_part = jnp.zeros_like(plen_f)
    if not cfg.use_hotwords:
        return lm_part
    hot_pref = (h_node != hot["dead"]) & (plen > 0)
    min_comp = (h_bits >> HOT_MINCOMP_SHIFT) & HOT_MINCOMP_MAX
    hot_part = prm["hot_weight"] * plen_f / jnp.maximum(min_comp, 1).astype(
        jnp.float32
    )
    return jnp.where(hot_pref, hot_part, lm_part)


def _make_step(
    jnp, cfg: EngineConfig, tok_dev: Dict, devs: List[Dict], hot: Dict, prm: Dict, n_frames
):
    """Build the per-frame scan body."""
    import jax

    b = cfg.beam_width
    k = cfg.k_tokens
    v = cfg.vocab_size
    c = b * k
    lmax = int(tok_dev["raw_chars"].shape[1])
    n_lms = cfg.n_lms
    tl = cfg.token_timeline

    def _flatten(x):
        """[B, K, ...] -> [K*B, ...] in token-major order (ref enumeration)."""
        return jnp.swapaxes(x, 0, 1).reshape((c,) + x.shape[2:])

    def step(state, xs):
        """One frame: expand -> merge -> fuse -> prune -> top-k.

        Timeline mode (cfg.token_timeline): one step is one K-wide token
        CHUNK of a frame (utils.logits.token_timeline). The step expands
        the (frozen) beam set with the chunk's tokens, merges in-chunk,
        pools the merged candidates with the carried top-B pool, and on
        the frame's last chunk promotes the pooled top-B to the new beam
        set (window prune applied there, over the whole frame's best).
        Non-final steps emit identity backpointers with token -3 (a
        carry marker the path replay skips), so the per-step backtrace
        chain composes unchanged.
        """
        if tl:
            # chunk_base (admitted tokens before this chunk) is part of
            # the timeline contract but no longer consumed: ranking ties
            # resolve purely by top_k position (see the ranking comment)
            toks_in, tok_logp, fin_i, t = xs
            active = t < n_frames
            is_final = fin_i != 0
            admit = toks_in >= 0
            toks = jnp.maximum(toks_in, 0).astype(jnp.int32)
        else:
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

        # per-chunk token-plane lookups. With traced token ids (timeline
        # chunks) each tiny-table index lowers to a scalar-core gather —
        # ~8 such planes cost ~90 ms per 768-batch — so small vocabularies
        # resolve every plane through ONE shared [K, V] one-hot mask
        # (_token_cols); big-vocab BPE keeps the gathers (the mask would
        # be [K, 32k] per step).
        _tc = None
        if tl and v <= 512:
            _tt = {
                "kind": tok_dev["kind"],
                "right": tok_dev["right_bound"],
                "plen": tok_dev["piece_len"],
                "rlen": tok_dev["raw_len"],
                "seed_lo": tok_dev["seed_lo"],
                "seed_hi": tok_dev["seed_hi"],
            }
            for l in range(lmax):
                _tt[f"cid{l}"] = tok_dev["raw_chars"][:, l]
            for i in range(n_lms):
                _tt[f"seed_ent{i}"] = devs[i]["seed_node_arr"]
            if cfg.use_hotwords:
                _tt["hot_seed"] = hot["seed"]
            _tc = _token_cols(jnp, _tt, toks, v)
            tok_kind = _tc["kind"]
            tok_right = _tc["right"]
            tok_plen = _tc["plen"]
            tok_rlen = _tc["rlen"]
        else:
            tok_kind = tok_dev["kind"][toks]
            tok_right = tok_dev["right_bound"][toks]
            tok_plen = tok_dev["piece_len"][toks]  # boundary piece length
            tok_rlen = tok_dev["raw_len"][toks]  # raw label length
        blank = tok_kind == KIND_BLANK
        boundary_kind = tok_kind == KIND_BOUNDARY

        alive = state["logit"] > DEAD_THRESH
        trie_rows_b = [
            trie_fetch_rows(
                jnp, devs[i]["trie_rows"], devs[i]["trie_pack"],
                state[f"p_node{i}"],
            )
            for i in range(n_lms)
        ]
        # NOTE (round-4 dead end, kept for the record): wrapping the
        # commit scoring in a per-utterance lax.cond on "this frame has
        # admitted a boundary token" (to skip the fp-probe gathers on the
        # ~75% of frames that cannot commit) is architecturally
        # incompatible with the vmapped batch program: vmap of cond with
        # a batched predicate lowers to BOTH branches executed + select,
        # and operand batching broadcast the n-gram bucket plane per
        # batch row (s32[384, 131072, 128] — 25.8 GB, compile-time OOM).
        # Per-utterance dynamic skipping needs divergent control flow,
        # which SPMD batching by construction does not have. The same
        # constraint blocks deduplicating cm across a frame's timeline
        # chunks (the beam state is frozen, so cm is identical per
        # chunk): a where(first_chunk, fresh, carried) still COMPUTES
        # the fresh probes every step — only cond could skip them, and
        # cond is the broadcast trap above.
        cm = _commit_quantities(
            jnp, cfg, devs, hot, prm, state, trie_rows=trie_rows_b
        )

        # ---- transition classes [B, K]
        stay = blank[None, :] | (state["last_tok"][:, None] == toks[None, :])
        if cfg.is_bpe:
            as_boundary = ~stay & (boundary_kind[None, :] | state["force"][:, None])
        else:
            as_boundary = ~stay & boundary_kind[None, :]

        # ---- partial-word extension walk (regular children, raw label).
        # Trie transitions return PACKED entries (child node + its flags),
        # so each walk step is one gather and scoring needs no flag lookups.
        ext_lo = jnp.broadcast_to(state["p_lo"][:, None], (b, k))
        ext_hi = jnp.broadcast_to(state["p_hi"][:, None], (b, k))
        ext_entries = [
            jnp.broadcast_to(
                (state[f"p_node{i}"] | state[f"p_flags{i}"])[:, None], (b, k)
            )
            for i in range(n_lms)
        ]
        if cfg.use_hotwords:
            ext_hentry = jnp.broadcast_to(
                (state["h_node"] | state["h_bits"])[:, None], (b, k)
            )
        if lmax == 1:
            # char alphabets: one char per label. Gather each beam's full
            # trie row (contiguous, B row-gathers) and index it by token
            # char in fast memory instead of B*K random gathers into HBM.
            cid = _tc["cid0"] if _tc is not None else tok_dev["raw_chars"][toks, 0]  # [K]
            has = (cid >= 0)[None, :]
            cid_safe = jnp.maximum(cid, 0)
            cid_b = jnp.broadcast_to(cid_safe[None, :], (b, k))
            nlo, nhi = hash_extend_char(jnp, ext_lo, ext_hi, cid_b)
            ext_lo = jnp.where(has, nlo, ext_lo)
            ext_hi = jnp.where(has, nhi, ext_hi)

            def _pick_cols(rows, idx):
                """rows[:, idx] without the per-beam vector index.

                ``rows[:, idx]`` lowers to a gather whose operand XLA
                re-lays out per step (~160 ms/batch of copies/reshapes
                at serving shapes); a [K, C] one-hot mask with a masked
                sum is pure VPU work and exact (one nonzero per (b, k),
                i32 sum of a single addend).
                """
                cmask = (
                    idx[:, None]
                    == jnp.arange(rows.shape[1], dtype=idx.dtype)[None, :]
                )  # [K, C]
                return jnp.sum(
                    jnp.where(cmask[None, :, :], rows[:, None, :], 0),
                    axis=2,
                    dtype=rows.dtype,
                )  # [B, K]

            for i in range(n_lms):
                tp = devs[i]["trie_pack"]
                rows = trie_rows_b[i]  # [B, W] (shared with commit scoring)
                word = _pick_cols(
                    rows[:, 1 : 1 + tp["ncw"]], cid_safe // tp["cpw"]
                )
                ent = _decode_trie_cells(jnp, jax, tp, rows[:, 0:1], word, cid_b)
                ext_entries[i] = jnp.where(has, ent, ext_entries[i])
            if cfg.use_hotwords:
                hrows = hot["next"][state["h_node"]]  # [B, C]
                ext_hentry = jnp.where(has, _pick_cols(hrows, cid_safe), ext_hentry)
        else:
            for l in range(lmax):
                cid = (
                    _tc[f"cid{l}"] if _tc is not None
                    else tok_dev["raw_chars"][toks, l]
                )  # [K]
                has = (cid >= 0)[None, :]
                cid_b = jnp.broadcast_to(jnp.maximum(cid, 0)[None, :], (b, k))
                nlo, nhi = hash_extend_char(jnp, ext_lo, ext_hi, cid_b)
                ext_lo = jnp.where(has, nlo, ext_lo)
                ext_hi = jnp.where(has, nhi, ext_hi)
                for i in range(n_lms):
                    tp = devs[i]["trie_pack"]
                    node = ext_entries[i] & _NODE_MASK
                    slot = (node % tp["pack"]) * tp["stride"]
                    word = devs[i]["trie_rows"][
                        node // tp["pack"], slot + 1 + cid_b // tp["cpw"]
                    ]
                    fc = devs[i]["trie_rows"][node // tp["pack"], slot]
                    ent = _decode_trie_cells(jnp, jax, tp, fc, word, cid_b)
                    ext_entries[i] = jnp.where(has, ent, ext_entries[i])
                if cfg.use_hotwords:
                    ext_hentry = jnp.where(
                        has,
                        hot["next"][ext_hentry & HOT_NODE_MASK, cid_b],
                        ext_hentry,
                    )

        if _tc is not None:
            seed_lo_k, seed_hi_k = _tc["seed_lo"], _tc["seed_hi"]
        else:
            seed_lo_k = tok_dev["seed_lo"][toks]
            seed_hi_k = tok_dev["seed_hi"][toks]
        seed_lo = jnp.broadcast_to(seed_lo_k[None, :], (b, k))
        seed_hi = jnp.broadcast_to(seed_hi_k[None, :], (b, k))
        p_lo_n = jnp.where(
            stay, state["p_lo"][:, None], jnp.where(as_boundary, seed_lo, ext_lo)
        )
        p_hi_n = jnp.where(
            stay, state["p_hi"][:, None], jnp.where(as_boundary, seed_hi, ext_hi)
        )
        if n_lms or cfg.use_hotwords:  # partial length feeds pscore only
            p_len_n = jnp.where(
                stay,
                state["p_len"][:, None],
                jnp.where(
                    as_boundary,
                    tok_plen[None, :],
                    state["p_len"][:, None] + tok_rlen[None, :],
                ),
            )
        p_entry_n = []
        for i in range(n_lms):
            seed_entry = jnp.broadcast_to(
                (
                    _tc[f"seed_ent{i}"] if _tc is not None
                    else devs[i]["seed_node_arr"][toks]
                )[None, :],
                (b, k),
            )
            p_entry_n.append(
                jnp.where(
                    stay,
                    (state[f"p_node{i}"] | state[f"p_flags{i}"])[:, None],
                    jnp.where(as_boundary, seed_entry, ext_entries[i]),
                )
            )
        if cfg.use_hotwords:
            seed_hentry = jnp.broadcast_to(
                (
                    _tc["hot_seed"] if _tc is not None
                    else hot["seed"][toks]
                )[None, :],
                (b, k),
            )
            h_entry_n = jnp.where(
                stay,
                (state["h_node"] | state["h_bits"])[:, None],
                jnp.where(as_boundary, seed_hentry, ext_hentry),
            )

        text_lo_n = jnp.where(
            as_boundary, cm["text_lo"][:, None], state["text_lo"][:, None]
        )
        text_hi_n = jnp.where(
            as_boundary, cm["text_hi"][:, None], state["text_hi"][:, None]
        )
        fused_n = state["fused"][:, None] + jnp.where(
            as_boundary, cm["word_fused"][:, None], 0.0
        )
        force_n = jnp.where(
            as_boundary, tok_right[None, :], state["force"][:, None]
        )
        logit_n = jnp.where(
            alive[:, None], state["logit"][:, None] + tok_logp[None, :], DEAD
        )
        valid = alive[:, None] & admit[None, :]

        # ---- merge keys (token identity is implicit: merges are
        # block-diagonal per token column, see _merge_dense)
        kl = mix4(jnp, text_lo_n, p_lo_n, p_hi_n, force_n.astype(jnp.uint32))
        kh = mix4(jnp, text_hi_n, p_hi_n, p_lo_n, force_n.astype(jnp.uint32))

        # every member of a merge group shares (text, partial), hence the
        # same fused accumulator and partial score — use each candidate's
        # OWN values rather than gathering the donor's (the [C]-wide donor
        # gathers were the single hottest ops on TPU)
        if n_lms or cfg.use_hotwords:
            pscore = _partial_score(
                jnp,
                cfg,
                hot,
                prm,
                [_flatten(p_entry_n[i] & ~_NODE_MASK) for i in range(n_lms)],
                _flatten(h_entry_n & HOT_NODE_MASK) if cfg.use_hotwords else None,
                _flatten(h_entry_n & ~HOT_NODE_MASK) if cfg.use_hotwords else None,
                _flatten(p_len_n),
            )
        else:
            pscore = None

        # ---- block-diagonal merge + window prune: [K, B] layout,
        # producing three [C] vectors: ``sc`` (pruned candidate score,
        # DEAD at duplicate members), ``merged_c`` (group logsumexp at
        # every member) and ``src_flat`` (newest group member, the
        # backtrace donor). (A fused Pallas expand+merge kernel lived
        # here through round 3; measured 31x SLOWER than XLA's reductions
        # at the serving shape — see ops/pallas_merge.py, retired.)
        to_kb = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        extra = (
            _flatten(fused_n) + pscore
            if pscore is not None
            else _flatten(fused_n)
        )
        # Materialize the [K, B] transposes before the merge: the
        # barrier stops XLA from folding the transpose into the merge
        # reductions as a bitcast-layout, which would leave the
        # reduced beam axis strided (k-minor layout) and run the
        # [K, B, B] sweeps ~10x slower than with the beam axis on
        # the 128-wide lanes (measured 14 ms vs 1 ms per frame at
        # batch 168, B=100, K=8).
        kl_t, kh_t, valid_t, logit_t = jax.lax.optimization_barrier(
            (to_kb(kl), to_kb(kh), to_kb(valid), to_kb(logit_n))
        )
        merged, dup, donor = _merge_dense(
            jnp, [kl_t, kh_t], valid_t, logit_t
        )
        src_flat = (
            jnp.arange(k, dtype=jnp.int32)[:, None] * b + donor
        ).reshape(c)
        rep = (valid_t & ~dup).reshape(c)
        merged_c = merged.reshape(c)  # group logsumexp at EVERY member
        merged_flat = jnp.where(rep, merged_c, DEAD)
        live = merged_flat > DEAD_THRESH
        lm_score_flat = jnp.where(live, merged_flat + extra, DEAD)
        if not tl:
            mx = jnp.max(lm_score_flat)
            sc = jnp.where(
                lm_score_flat >= mx + prm["beam_prune_logp"],
                lm_score_flat,
                DEAD,
            )

        if tl:
            # ---- pool ∪ chunk ranking. The window prune moves to the
            # frame's LAST chunk (its max is only known then; the pooled
            # top-1 IS the frame max since pooling is exact top-B).
            # Ranking key = (score desc, frame-local enumeration rank asc).
            # A single-operand lax.top_k realizes that key exactly: its
            # equal-score tie-break is lowest POSITION, and position order
            # coincides with enumeration-rank order within every
            # equal-score class, inductively: pool entries precede chunk
            # candidates positionally and carry strictly smaller ranks
            # (earlier chunks of the frame); chunk candidates sit in
            # enumeration order; and the pool itself is a previous top_k
            # output, so equal-score pool members are already
            # position==rank ordered. No rank needs to be carried or
            # compared — one top-k over [B + KB] replaced a three-operand
            # two-key sort (~7% of step time).
            iota_b = jnp.arange(b, dtype=jnp.int32)
            comb_score = jnp.concatenate([state["pool_score"], lm_score_flat])
            if cfg.fast_topk:
                # approx_max_k with recall 1.0: exact top-k SET via
                # PartialReduce instead of the full sort top_k lowers to;
                # the re-sort restores position order within the set, so
                # only exact-score ties ACROSS the selection boundary can
                # diverge (see EngineConfig.fast_topk — opt-in, and the
                # bench promotes it only when still output-exact in-run)
                top_scores, top_src = jax.lax.approx_max_k(
                    comb_score, b, recall_target=1.0
                )
                _, top_src, top_scores = jax.lax.sort(
                    (-top_scores, top_src.astype(jnp.int32), top_scores),
                    num_keys=2,
                )
            else:
                top_scores, top_src = jax.lax.top_k(comb_score, b)
            top_src = top_src.astype(jnp.int32)
            win = top_scores[0] + prm["beam_prune_logp"]
            if cfg.collect_stats:
                # candidates killed by the window prune (applied on the
                # frame's final chunk, over the whole frame's pool)
                tl_win_killed = jnp.sum(
                    (top_scores > DEAD_THRESH) & (top_scores < win),
                    dtype=jnp.int32,
                )
            top_scores = jnp.where(
                is_final & (top_scores < win), DEAD, top_scores
            )
            cand = {
                "_pf": jnp.concatenate(
                    [state["pool_pf"], jnp.tile(iota_b, k)]
                ),
                "_pd": jnp.concatenate(
                    [state["pool_pd"], (src_flat % b).astype(jnp.int32)]
                ),
                "_tok": jnp.concatenate(
                    [state["pool_tok"], jnp.repeat(toks, b)]
                ),
                "_logit": jnp.concatenate([state["pool_logit"], merged_c]),
            }
            chunks = {
                "_pf": 1 if b <= 0xFF else 2,
                "_pd": 1 if b <= 0xFF else 2,
                "_tok": 2 if v <= 0xFFFF else 4,
            }
            for i in range(n_lms):
                cand[f"_ent{i}"] = jnp.concatenate(
                    [state[f"pool_ent{i}"], _flatten(p_entry_n[i])]
                )
            if cfg.use_hotwords:
                cand["_h"] = jnp.concatenate(
                    [state["pool_h"], _flatten(h_entry_n)]
                )
            sel = _select_fields_mxu(jnp, cand, top_src, b + c, n_chunks=chunks)
            top_parent = sel.pop("_pf")
            parent_trace = sel.pop("_pd")
            sel_tok = sel.pop("_tok")
            top_logit = sel.pop("_logit")
            sel_alive = top_scores > DEAD_THRESH
            # dead pool lanes carry the -1 token sentinel, which the
            # narrowed 2-chunk select zero-extends to 0xFFFF — restore it
            # so pool_tok's documented sentinel survives selection of
            # dead lanes (latent otherwise: DEAD scores mask them today)
            sel_tok = jnp.where(sel_alive, sel_tok, -1)
            parent = parent_trace
            new_state = {}
            pool_new = {
                "pool_score": jnp.where(is_final, DEAD, top_scores),
                "pool_logit": jnp.where(is_final, DEAD, top_logit),
                "pool_pf": jnp.where(is_final, iota_b, top_parent),
                "pool_pd": jnp.where(is_final, iota_b, parent_trace),
                "pool_tok": jnp.where(is_final, -1, sel_tok),
            }
            for i in range(n_lms):
                ent = sel.pop(f"_ent{i}")
                pool_new[f"pool_ent{i}"] = jnp.where(is_final, 0, ent)
                new_state[f"p_node{i}"] = ent & _NODE_MASK
                new_state[f"p_flags{i}"] = ent & ~_NODE_MASK
            if cfg.use_hotwords:
                h_ent = sel.pop("_h")
                pool_new["pool_h"] = jnp.where(is_final, 0, h_ent)
                new_state["h_node"] = h_ent & HOT_NODE_MASK
                new_state["h_bits"] = h_ent & ~HOT_NODE_MASK
        else:
            # ---- top-k on scores only; everything positional (donor
            # index, merged logit, token id, state fields) rides one-hot
            # MXU selections instead of row gathers. The operand matrices
            # are the step's main HBM traffic, so the C-wide select
            # carries ONLY truly per-candidate fields (narrowed to their
            # live chunk widths); two-way carried-vs-committed fields
            # (ring, ctx) ride a B-wide parent select — 16x fewer rows —
            # resolved by the winner's own boundary flag.
            if cfg.fast_topk:
                top_scores, top_idx = jax.lax.approx_max_k(
                    sc, cfg.beam_width, recall_target=1.0
                )
                top_idx = top_idx.astype(jnp.int32)
                # restore the reference's enumeration tie order among the
                # selected set (a 100-element two-key sort is ~free); only
                # exact-score ties ACROSS the selection boundary remain
                # approximate — see EngineConfig.fast_topk
                _, top_idx, top_scores = jax.lax.sort(
                    (-top_scores, top_idx, top_scores), num_keys=2
                )
            else:
                top_scores, top_idx = jax.lax.top_k(sc, cfg.beam_width)
            # Only quantities that depend on the merge GROUP (the donor
            # index and the group logsumexp) or on the trie walk ride the
            # C-wide select. Every other state field is a deterministic
            # function of (parent beam, token), so it is re-derived for
            # the B winners from a B-wide parent select — 16x fewer
            # operand rows, and the transition replay below is pure
            # [B]-width arithmetic.
            tok_col = top_idx // b  # winner's token column
            top_parent = (top_idx % b).astype(jnp.int32)
            cand = {
                "_src": src_flat,
                "_logit": merged_c,  # every member carries the group logsumexp
            }
            chunks = {"_src": 2 if c <= 0xFFFF else 4}
            for i in range(n_lms):
                cand[f"_ent{i}"] = _flatten(p_entry_n[i])
            if cfg.use_hotwords:
                cand["_h"] = _flatten(h_entry_n)
            sel = _select_fields_mxu(
                jnp, cand, top_parent, b, n_chunks=chunks,
                token_factor=(tok_col, k, b),
            )
            src = sel.pop("_src")
            top_logit = sel.pop("_logit")
            sel_alive = top_scores > DEAD_THRESH
            parent = (src % b).astype(jnp.int32)  # newest-wins, backtrace only
            new_state = {}
            for i in range(n_lms):
                ent = sel.pop(f"_ent{i}")
                new_state[f"p_node{i}"] = ent & _NODE_MASK
                new_state[f"p_flags{i}"] = ent & ~_NODE_MASK
            if cfg.use_hotwords:
                h_ent = sel.pop("_h")
                new_state["h_node"] = h_ent & HOT_NODE_MASK
                new_state["h_bits"] = h_ent & ~HOT_NODE_MASK
        # committed-variant (m_*) text hashes, rings and word counts are
        # NOT selected: they are deterministic per-beam functions of the
        # selected carried fields (hash_text_commit / ring shift / +1),
        # recomputed for the B winners below — ~27 fewer operand rows in
        # the select's bf16 matrix. Only probe-derived m_* quantities
        # (word_fused, contexts, backoffs) still ride the select.
        # biased narrowings (round 5): the operand matrix is the select's
        # HBM traffic, so signed fields ride biased-to-nonnegative at
        # fewer 8-bit chunks and un-bias after selection —
        # * last_tok ∈ [-2-(b-1), V): +（2+b) fits 16 bits for char/BPE
        #   vocabularies;
        # * ctx word ids ∈ {-1} ∪ [0, V): +1 fits 24 bits for any
        #   realistic vocabulary;
        # * p_len counts chars of ONE in-progress word: 16 bits.
        last_narrow = v + b + 3 <= 0xFFFF
        ctx_narrow = v < 0xFFFFFF  # vocab ids; -1 pad biased to 0
        beam_fields = {
            "c_text_lo": state["text_lo"],
            "c_text_hi": state["text_hi"],
            "c_p_lo": state["p_lo"],
            "c_p_hi": state["p_hi"],
            "c_p_len": state["p_len"],
            "c_last": (
                state["last_tok"] + (2 + b) if last_narrow
                else state["last_tok"]
            ),
            "c_force": state["force"],
            "c_fused": state["fused"],
            "m_wfused": cm["word_fused"],
            "c_nw": state["n_words"],
            "c_ring_lo": state["ring_lo"],
            "c_ring_hi": state["ring_hi"],
        }
        beam_chunks = {
            "c_p_len": 2,
            "c_force": 1,
            "c_nw": 3,
            "c_last": 2 if last_narrow else 4,
        }
        for i in range(n_lms):
            if ctx_narrow:
                beam_fields[f"c_ctx{i}"] = state[f"ctx{i}"] + 1
                beam_fields[f"m_ctx{i}"] = cm[f"ctx{i}"] + 1
                beam_chunks[f"c_ctx{i}"] = 3
                beam_chunks[f"m_ctx{i}"] = 3
            else:
                beam_fields[f"c_ctx{i}"] = state[f"ctx{i}"]
                beam_fields[f"m_ctx{i}"] = cm[f"ctx{i}"]
            beam_fields[f"c_ctx_len{i}"] = state[f"ctx_len{i}"]
            beam_fields[f"m_ctx_len{i}"] = cm[f"ctx_len{i}"]
            beam_fields[f"c_ctx_bo{i}"] = state[f"ctx_bo{i}"]
            beam_fields[f"m_ctx_bo{i}"] = cm[f"ctx_bo{i}"]
            # context length <= order-1 <= 15: one 8-bit chunk suffices
            beam_chunks[f"c_ctx_len{i}"] = 1
            beam_chunks[f"m_ctx_len{i}"] = 1
        bsel = _select_fields_mxu(
            jnp, beam_fields, top_parent, b, n_chunks=beam_chunks
        )
        if last_narrow:
            bsel["c_last"] = bsel["c_last"] - (2 + b)
        if ctx_narrow:
            for i in range(n_lms):
                bsel[f"c_ctx{i}"] = bsel[f"c_ctx{i}"] - 1
                bsel[f"m_ctx{i}"] = bsel[f"m_ctx{i}"] - 1
        # ---- transition replay for the winners (parity-exact: the same
        # 4-way rules as the [B, K] expansion above, applied to the same
        # (parent, token) pair the top-ranked group member came from).
        # All per-token quantities resolve through one shared one-hot mask
        # (_token_cols) — tab[tok_col] gathers were over half the step.
        if tl:
            # winners may carry tokens from EARLIER chunks of the frame
            # (pool entries), so token planes resolve by full-vocab token
            # id, not by this chunk's column index. Mirror the forward
            # planes' guard: the [B, V] one-hot pays off only for small
            # vocabularies; big-vocab BPE keeps per-beam gathers.
            kind_v = tok_dev["kind"]
            tok_safe = jnp.maximum(sel_tok, 0)
            if v <= 512:
                tcols = _token_cols(
                    jnp,
                    {
                        "tok": jnp.arange(v, dtype=jnp.int32),
                        "blank": kind_v == KIND_BLANK,
                        "boundary": kind_v == KIND_BOUNDARY,
                        "right": tok_dev["right_bound"],
                        "seed_lo": tok_dev["seed_lo"],
                        "seed_hi": tok_dev["seed_hi"],
                        "plen": tok_dev["piece_len"],
                        "rlen": tok_dev["raw_len"],
                        **{
                            f"cid{l}": tok_dev["raw_chars"][:, l]
                            for l in range(lmax)
                        },
                    },
                    tok_safe,
                    v,
                )
            else:
                tcols = {
                    "tok": tok_safe,
                    "blank": kind_v[tok_safe] == KIND_BLANK,
                    "boundary": kind_v[tok_safe] == KIND_BOUNDARY,
                    "right": tok_dev["right_bound"][tok_safe],
                    "seed_lo": tok_dev["seed_lo"][tok_safe],
                    "seed_hi": tok_dev["seed_hi"][tok_safe],
                    "plen": tok_dev["piece_len"][tok_safe],
                    "rlen": tok_dev["raw_len"][tok_safe],
                    **{
                        f"cid{l}": tok_dev["raw_chars"][tok_safe, l]
                        for l in range(lmax)
                    },
                }
        else:
            tcols = _token_cols(
                jnp,
                {
                    "tok": toks,
                    "blank": blank,
                    "boundary": boundary_kind,
                    "right": tok_right,
                    "seed_lo": seed_lo_k,
                    "seed_hi": seed_hi_k,
                    "plen": tok_plen,
                    "rlen": tok_rlen,
                    **{
                        f"cid{l}": tok_dev["raw_chars"][toks, l]
                        for l in range(lmax)
                    },
                },
                tok_col,
                k,
            )
        tok_w = tcols["tok"]
        # winner-side recompute of the committed-variant fields (exact:
        # same formulas as _commit_quantities applied to the selected
        # carried fields)
        commit_w = bsel["c_p_len"] > 0
        mt_lo, mt_hi = hash_text_commit(
            jnp, bsel["c_text_lo"], bsel["c_text_hi"],
            bsel["c_p_lo"], bsel["c_p_hi"],
        )
        m_text_lo_w = jnp.where(commit_w, mt_lo, bsel["c_text_lo"])
        m_text_hi_w = jnp.where(commit_w, mt_hi, bsel["c_text_hi"])
        m_ring_lo_w = jnp.where(
            commit_w[:, None],
            jnp.concatenate(
                [bsel["c_ring_lo"][:, 1:], bsel["c_p_lo"][:, None]], axis=1
            ),
            bsel["c_ring_lo"],
        )
        m_ring_hi_w = jnp.where(
            commit_w[:, None],
            jnp.concatenate(
                [bsel["c_ring_hi"][:, 1:], bsel["c_p_hi"][:, None]], axis=1
            ),
            bsel["c_ring_hi"],
        )
        m_nw_w = bsel["c_nw"] + commit_w.astype(jnp.int32)
        stay_w = tcols["blank"] | (bsel["c_last"] == tok_w)
        if cfg.is_bpe:
            bnd_w = ~stay_w & (tcols["boundary"] | bsel["c_force"])
        else:
            bnd_w = ~stay_w & tcols["boundary"]
        ext_lo_w, ext_hi_w = bsel["c_p_lo"], bsel["c_p_hi"]
        for l in range(lmax):
            cid_w = tcols[f"cid{l}"]
            has_w = cid_w >= 0
            nlo_w, nhi_w = hash_extend_char(
                jnp, ext_lo_w, ext_hi_w, jnp.maximum(cid_w, 0)
            )
            ext_lo_w = jnp.where(has_w, nlo_w, ext_lo_w)
            ext_hi_w = jnp.where(has_w, nhi_w, ext_hi_w)
        new_state["p_lo"] = jnp.where(
            stay_w, bsel["c_p_lo"], jnp.where(bnd_w, tcols["seed_lo"], ext_lo_w)
        )
        new_state["p_hi"] = jnp.where(
            stay_w, bsel["c_p_hi"], jnp.where(bnd_w, tcols["seed_hi"], ext_hi_w)
        )
        new_state["p_len"] = jnp.where(
            stay_w,
            bsel["c_p_len"],
            jnp.where(
                bnd_w, tcols["plen"], bsel["c_p_len"] + tcols["rlen"]
            ),
        )
        new_state["text_lo"] = jnp.where(bnd_w, m_text_lo_w, bsel["c_text_lo"])
        new_state["text_hi"] = jnp.where(bnd_w, m_text_hi_w, bsel["c_text_hi"])
        new_state["fused"] = bsel["c_fused"] + jnp.where(bnd_w, bsel["m_wfused"], 0.0)
        new_state["n_words"] = jnp.where(bnd_w, m_nw_w, bsel["c_nw"])
        new_state["force"] = jnp.where(bnd_w, tcols["right"], bsel["c_force"])
        new_state["last_tok"] = tok_w
        bnd2 = bnd_w[:, None]
        new_state["ring_lo"] = jnp.where(bnd2, m_ring_lo_w, bsel["c_ring_lo"])
        new_state["ring_hi"] = jnp.where(bnd2, m_ring_hi_w, bsel["c_ring_hi"])
        for i in range(n_lms):
            new_state[f"ctx{i}"] = jnp.where(
                bnd2, bsel[f"m_ctx{i}"], bsel[f"c_ctx{i}"]
            )
            new_state[f"ctx_len{i}"] = jnp.where(
                bnd_w, bsel[f"m_ctx_len{i}"], bsel[f"c_ctx_len{i}"]
            )
            new_state[f"ctx_bo{i}"] = jnp.where(
                bnd2, bsel[f"m_ctx_bo{i}"], bsel[f"c_ctx_bo{i}"]
            )
        token_sel = new_state["last_tok"]  # == toks[src // b] by construction
        new_state["logit"] = jnp.where(sel_alive, top_logit, DEAD)
        new_state["last_tok"] = jnp.where(
            sel_alive, new_state["last_tok"], -2 - jnp.arange(b, dtype=jnp.int32)
        )

        if cfg.prune_history:
            # fold the (partial, last token, word count, history ring) key
            # into two mixed 32-bit lanes so the B x B dedup is 2 compares
            # instead of 4 + 2*ring_width (the beam identity is already a
            # pair of rolling hashes — same accepted collision class)
            nw_cap = jnp.minimum(new_state["n_words"], cfg.ring_width).astype(
                jnp.uint32
            )
            # the BPE forced-break flag is part of the key (beams
            # differing only in a pending break transition differently;
            # see the host _collapse_history note)
            nw_cap = nw_cap | (
                new_state["force"].astype(jnp.uint32) << jnp.uint32(16)
            )
            hk_lo = mix4(
                jnp,
                new_state["p_lo"],
                new_state["p_hi"],
                new_state["last_tok"].astype(jnp.uint32),
                nw_cap,
            )
            hk_hi = mix4(
                jnp,
                new_state["p_hi"],
                new_state["p_lo"],
                nw_cap,
                new_state["last_tok"].astype(jnp.uint32) ^ jnp.uint32(0x9E3779B9),
            )
            for i in range(cfg.ring_width):
                hk_lo = mix4(
                    jnp, hk_lo, new_state["ring_lo"][:, i],
                    new_state["ring_hi"][:, i], jnp.uint32(2 * i + 1),
                )
                hk_hi = mix4(
                    jnp, hk_hi, new_state["ring_hi"][:, i],
                    new_state["ring_lo"][:, i], jnp.uint32(2 * i + 2),
                )
            eq = (hk_lo[:, None] == hk_lo[None, :]) & (
                hk_hi[:, None] == hk_hi[None, :]
            )
            lower = jnp.tril(jnp.ones((b, b), dtype=bool), k=-1)
            dup_h = jnp.any(eq & lower, axis=1)
            new_state["logit"] = jnp.where(dup_h, DEAD, new_state["logit"])
            new_state["last_tok"] = jnp.where(
                dup_h, -2 - jnp.arange(b, dtype=jnp.int32), new_state["last_tok"]
            )

        if cfg.collect_stats:
            # timeline mode: per-chunk work counters (beams, candidates,
            # merges, probes) accumulate every active step; frame-shaped
            # counters (frames, window prune, selection, history prune,
            # commits) count only the frame's FINAL chunk, where the pool
            # promotes to the beam set — so their per-frame rates read
            # the same as in dense mode (stats_fields docstring).
            fin_gate = (
                is_final.astype(jnp.int32) if tl else jnp.int32(1)
            )
            counts = [
                fin_gate,  # frames
                jnp.sum(alive, dtype=jnp.int32),
                jnp.sum(valid, dtype=jnp.int32),
                jnp.sum(to_kb(valid) & dup, dtype=jnp.int32),
                (
                    fin_gate * tl_win_killed
                    if tl
                    else jnp.sum(
                        live
                        & (lm_score_flat < mx + prm["beam_prune_logp"]),
                        dtype=jnp.int32,
                    )
                ),
                fin_gate * jnp.sum(sel_alive, dtype=jnp.int32),
                (
                    fin_gate * jnp.sum(dup_h, dtype=jnp.int32)
                    if cfg.prune_history
                    else jnp.int32(0)
                ),
                # words ACTUALLY committed: winners that took a boundary
                # transition while holding a partial (cm["commit"] alone
                # is merely "holds a partial", true for most beams on
                # most frames)
                fin_gate
                * jnp.sum(bnd_w & commit_w & sel_alive, dtype=jnp.int32),
            ]
            if n_lms:
                alive_ct = jnp.sum(alive, dtype=jnp.int32)
                counts.append(jnp.int32(n_lms) * alive_ct)  # probe_queries
                for order_n in range(1, max(cfg.lm_orders) + 1):
                    h = jnp.int32(0)
                    for hits in cm["probe_hits"]:
                        if order_n <= len(hits):
                            h = h + jnp.sum(
                                hits[order_n - 1] & alive, dtype=jnp.int32
                            )
                    counts.append(h)
            new_state["stats"] = state["stats"] + jnp.stack(counts)

        if tl:
            # beam lanes advance only on the frame's LAST chunk; the pool
            # lanes advance every active step. Non-final steps emit
            # identity backpointers with token -3 (carry marker): the
            # backtrace chain composes through them unchanged and the
            # host path replay skips them.
            promote = active & is_final
            iota_b = jnp.arange(b, dtype=jnp.int32)
            out_state = {}
            for key, old in state.items():
                if key.startswith("pool_"):
                    out_state[key] = jnp.where(active, pool_new[key], old)
                elif key == "stats":
                    # counters accumulate every ACTIVE step (frame-shaped
                    # entries are already final-chunk-gated above)
                    out_state[key] = jnp.where(active, new_state[key], old)
                else:
                    out_state[key] = jnp.where(promote, new_state[key], old)
            parent = jnp.where(promote, parent, iota_b)
            token_sel = jnp.where(promote, token_sel, -3)
            token_sel = jnp.where(active, token_sel, -1)
            return out_state, (parent, token_sel)

        # inactive (padded) frames pass state through untouched
        out_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old), new_state, state
        )
        parent = jnp.where(active, parent, jnp.arange(b, dtype=jnp.int32))
        token_sel = jnp.where(active, token_sel, -1)
        return out_state, (parent, token_sel)

    return step


def _finalize(
    jnp,
    cfg: EngineConfig,
    devs: List[Dict],
    hot: Dict,
    prm: Dict,
    state: Dict,
    do_commit,
    is_end,
):
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
        is_hot_word = (state["h_bits"] & HOT_WORD_BIT) != 0
        hot_gain = prm["hot_weight"] * (is_hot_word & commit).astype(jnp.float32)
    else:
        hot_gain = jnp.zeros_like(state["fused"])
    t_lo, t_hi = hash_text_commit(
        jnp, state["text_lo"], state["text_hi"], state["p_lo"], state["p_hi"]
    )
    text_lo = jnp.where(commit, t_lo, state["text_lo"])
    text_hi = jnp.where(commit, t_hi, state["text_hi"])
    ring_lo = jnp.where(
        commit[:, None],
        jnp.concatenate([state["ring_lo"][:, 1:], state["p_lo"][:, None]], axis=1),
        state["ring_lo"],
    )
    ring_hi = jnp.where(
        commit[:, None],
        jnp.concatenate([state["ring_hi"][:, 1:], state["p_hi"][:, None]], axis=1),
        state["ring_hi"],
    )
    n_words = state["n_words"] + commit.astype(jnp.int32)

    # the word scored at finalization: the committed partial, or the empty
    # word (<unk>) when nothing commits but the stream ends
    score_word = is_end | commit
    fused_sum = jnp.zeros_like(state["fused"])
    ctx_views, ctx_len_views, ctx_carries, ctx_len_carries = [], [], [], []
    ctx_bo_carries = []
    for i, (dev, order) in enumerate(zip(devs, cfg.lm_orders)):
        node = state[f"p_node{i}"]
        flags = state[f"p_flags{i}"]
        in_model = ((flags & _BIT_IN_VOCAB) != 0) & commit
        wid = jnp.where(in_model, dev["trie_word_id"][node], dev["unk_id"])
        in_uni = ((flags & _BIT_UNI_WORD) != 0) & commit
        is_oov = (dev["has_unigrams"] & ~in_uni) | ~in_model
        raw10, ctx2, ctx2_len, ctx2_bo = lm_score_words_jnp(
            dev,
            order,
            dev["unk_prob10"],
            state[f"ctx{i}"],
            state[f"ctx_len{i}"],
            wid,
            state[f"ctx_bo{i}"],
        )
        eos = jnp.full((b,), dev["eos_id"], dtype=jnp.int32)
        eos10, _, _, _ = lm_score_words_jnp(
            dev, order, dev["unk_prob10"], ctx2, ctx2_len, eos, ctx2_bo
        )
        lm_prm = prm["lm"][i]
        raw = raw10 + lm_prm["unk_offset"] * is_oov.astype(jnp.float32)
        raw = raw + jnp.where(is_end & lm_prm["score_boundary"], eos10, 0.0)
        fused_sum = fused_sum + (
            lm_prm["alpha"] * raw * np.float32(LOG_BASE_CHANGE_FACTOR) + lm_prm["beta"]
        )
        ctx_views.append(jnp.where(score_word[:, None], ctx2, state[f"ctx{i}"]))
        ctx_len_views.append(jnp.where(score_word, ctx2_len, state[f"ctx_len{i}"]))
        ctx_carries.append(jnp.where(commit[:, None], ctx2, state[f"ctx{i}"]))
        ctx_len_carries.append(jnp.where(commit, ctx2_len, state[f"ctx_len{i}"]))
        ctx_bo_carries.append(jnp.where(commit[:, None], ctx2_bo, state[f"ctx_bo{i}"]))
    if cfg.n_lms:
        word_fused = jnp.where(score_word, fused_sum / cfg.n_lms, 0.0)
        fused_scored = state["fused"] + word_fused + hot_gain
    else:
        fused_scored = state["fused"] + hot_gain
    pscore = _partial_score(
        jnp,
        cfg,
        hot,
        prm,
        [state[f"p_flags{i}"] for i in range(cfg.n_lms)],
        state["h_node"] if cfg.use_hotwords else None,
        state["h_bits"] if cfg.use_hotwords else None,
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
    kl = mix4(jnp, text_lo, p_lane_lo, last_lane, force_lane)
    kh = mix4(jnp, text_hi, p_lane_hi, last_lane, force_lane)
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
        "p_len": jnp.zeros((b,), dtype=jnp.int32),
        "last_tok": jnp.where(sel_alive, -1, -2 - jnp.arange(b, dtype=jnp.int32)),
        "force": jnp.zeros((b,), dtype=bool),
        "logit": jnp.where(sel_alive, logit, DEAD),
        "fused": fused_scored[src],
        "ring_lo": ring_lo[src],
        "ring_hi": ring_hi[src],
        "n_words": n_words[src],
    }
    for i in range(cfg.n_lms):
        committed_state[f"p_node{i}"] = jnp.zeros((b,), dtype=jnp.int32)
        committed_state[f"p_flags{i}"] = jnp.zeros((b,), dtype=jnp.int32)
        committed_state[f"ctx{i}"] = ctx_carries[i][src]
        committed_state[f"ctx_len{i}"] = ctx_len_carries[i][src]
        committed_state[f"ctx_bo{i}"] = ctx_bo_carries[i][src]
    if cfg.use_hotwords:
        committed_state["h_node"] = jnp.zeros((b,), dtype=jnp.int32)
        committed_state["h_bits"] = jnp.zeros((b,), dtype=jnp.int32)
    return {
        "src": src,
        "logit": logit,
        "score": score,
        "ctx": tuple(cv[src] for cv in ctx_views),
        "ctx_len": tuple(cl[src] for cl in ctx_len_views),
        "committed_state": committed_state,
    }


def make_decode_fn(
    cfg: EngineConfig,
    tokens: TokenArrays,
    device_lms: Union[None, DeviceLM, Sequence[DeviceLM]],
    shard: Optional[Tuple[str, int]] = None,
) -> "object":
    """Build the jittable one-utterance decode function.

    ``fn(logp [T,V] f32, n_frames i32, params f32 vector, start (per-member
    tuple of {"ctx","len","bo"} dicts), tabs (build_table_args pytree),
    hot)`` returns final ranked beams plus per-frame backpointers for
    host-side reconstruction.

    ``shard=(axis_name, n_shards)`` builds the variant whose LM probes run
    collectively against mesh-sharded tables; it is only valid inside a
    ``shard_map`` over that axis, with ``tabs`` built by
    :func:`build_table_args` with the same ``shard``.
    """
    import jax
    import jax.numpy as jnp

    meta = build_table_meta(device_lms, shard)

    def decode(logp, n_frames, params, start, tabs, hot=None):
        """Full-utterance decode: scan all frames, then finalize.

        With ``cfg.token_timeline``, ``logp`` is the host-built timeline
        tuple ``(toks [Tv,K] int, tlogp [Tv,K] f32, is_final [Tv] int)`` and ``n_frames`` counts VIRTUAL steps.
        """
        tok_dev, devs = _merge_tables(tabs, meta)
        prm = _params_dict(cfg, params)
        state0 = _init_state(jnp, cfg, start)
        step = _make_step(jnp, cfg, tok_dev, devs, hot, prm, n_frames)
        if cfg.token_timeline:
            toks_t, tlogp_t, fin_t = logp
            t_idx = jnp.arange(toks_t.shape[0], dtype=jnp.int32)
            xs = (toks_t, tlogp_t, fin_t, t_idx)
        else:
            t_idx = jnp.arange(logp.shape[0], dtype=jnp.int32)
            xs = (logp, t_idx)
        final_state, (parents, trace) = jax.lax.scan(step, state0, xs)
        fin = _finalize(
            jnp, cfg, devs, hot, prm, final_state, jnp.bool_(True), jnp.bool_(True)
        )
        if cfg.emit_paths is None:
            out = {
                "beam_src": fin["src"],
                "logit": fin["logit"],
                "lm_score": fin["score"],
                "ctx": fin["ctx"],
                "ctx_len": fin["ctx_len"],
                "parents": parents.astype(_parent_dtype(jnp, cfg.beam_width)),
                "trace": trace.astype(_path_dtype(jnp, cfg.vocab_size)),
            }
            if cfg.collect_stats:
                out["stats"] = final_state["stats"]
        else:
            # on-device backtrace of the top-N beams: tiny [N, T] output.
            # Everything else is sliced to those N rows too — the
            # device->host link is the scarce resource for batch decoding
            # (measured ~5 MB/s through the relay), not device FLOPs.
            r = cfg.emit_paths

            def back(cur, xs):
                """One reverse step: follow parents, emit chosen tokens."""
                par_t, tok_t = xs
                return par_t[cur], tok_t[cur]

            # scan(reverse=True) walks the frames back-to-front and writes
            # each step's tokens at its own frame index, so the paths come
            # out in forward order with NO materialized reverse ops — a
            # [::-1]/flip on the output path miscompiled through the TPU
            # relay at some batch shapes (batch 384: the leading frames
            # came back un-reversed).
            _, toks = jax.lax.scan(
                back,
                fin["src"][:r],
                (parents, trace),
                reverse=True,
            )
            out = {
                "beam_src": fin["src"][:r],
                "logit": fin["logit"][:r],
                "lm_score": fin["score"][:r],
                "ctx": tuple(c[:r] for c in fin["ctx"]),
                "ctx_len": tuple(c[:r] for c in fin["ctx_len"]),
                # narrow on device: the path plane is the transfer payload
                "paths": toks.swapaxes(0, 1).astype(
                    _path_dtype(jnp, cfg.vocab_size)
                ),  # [N, Tp]
            }
            if cfg.collect_stats:
                out["stats"] = final_state["stats"]
        return out

    return decode


def make_segment_decode_fns(
    cfg: EngineConfig,
    tokens: TokenArrays,
    device_lms: Union[None, DeviceLM, Sequence[DeviceLM]],
    seg_frames: int,
) -> Tuple:
    """Build the segmented (host-dispatched, loop-free) decode programs.

    XLA lowers gathers that sit inside a ``while`` body to a scalar path
    (~11 ns/row measured on v5e) while the same gather at program top
    level runs vectorized (~0.25 ns/row, a 40-50x gap) — and the LM probe
    and trie gathers dominate decode time. So instead of one program
    scanning all frames, the frame loop is hoisted to the host: each
    compiled program unrolls ``seg_frames`` steps with every gather at top
    level, and the driver chains segments through device-resident state
    (async dispatch keeps the chip busy; per-call overhead measured
    ~13 us). Segment programs are reused across segment indices, batches
    and utterance lengths — the frame offset rides as a traced scalar.

    Returns ``(init_fn, seg_fn, fin_fn)``:

    * ``init_fn(start) -> state`` — fresh beam state (broadcast over the
      batch by the caller's vmap).
    * ``seg_fn(state, logp_seg [C,V], t0, n_frames, params, tabs, hot) ->
      (state', ptrace [C,B])`` — ``C = seg_frames`` unrolled frames
      starting at absolute frame ``t0``. ``ptrace`` packs each step's
      (parent, token) emission into one int32 (``parent | (token+4)<<16``)
      when the beam width and vocabulary fit — the backpointer log is the
      segment chain's dominant HBM write volume (~300 MB per parity-config
      batch unpacked), so halving it is a direct bandwidth saving. Falls
      back to a ``(parents, trace)`` tuple for huge vocabularies.
    * ``fin_fn(state, params, tabs, ptrace, hot) -> out`` — ranking +
      (``cfg.emit_paths``) on-device backtrace, same output pytree as
      :func:`make_decode_fn`'s ``decode`` (``out["ptrace"]`` replaces
      ``parents``/``trace`` when packed).
    """
    import jax
    import jax.numpy as jnp

    meta = build_table_meta(device_lms)
    # token emissions reach -3 (timeline carry marker); +4 keeps them
    # non-negative. The sum stays within int32 for vocab <= 32760.
    pack = cfg.beam_width <= 0xFFFF and cfg.vocab_size + 8 <= 0x7FFF

    def init_fn(start):
        """Fresh beam state for one utterance."""
        return _init_state(jnp, cfg, start)

    def seg_fn(state, logp_seg, t0, n_frames, params, tabs, hot=None):
        """Advance the beam state through ``seg_frames`` unrolled frames.

        With ``cfg.token_timeline`` the per-segment input is the timeline
        slice ``(toks [S,K] int, tlogp [S,K] f32, is_final [S] int)``
        and ``n_frames`` counts virtual steps.
        """
        tok_dev, devs = _merge_tables(tabs, meta)
        prm = _params_dict(cfg, params)
        step = _make_step(jnp, cfg, tok_dev, devs, hot, prm, n_frames)
        parents, trace = [], []
        for i in range(seg_frames):
            if cfg.token_timeline:
                toks_t, tlogp_t, fin_t = logp_seg
                xs = (toks_t[i], tlogp_t[i], fin_t[i], t0 + i)
            else:
                xs = (logp_seg[i], t0 + i)
            state, (par, tok) = step(state, xs)
            parents.append(par)
            trace.append(tok)
        if pack:
            packed = [
                p | ((t + 4) << 16) for p, t in zip(parents, trace)
            ]
            return state, jnp.stack(packed)
        return state, (jnp.stack(parents), jnp.stack(trace))

    def fin_fn(state, params, tabs, ptrace, hot=None):
        """Rank final hypotheses and backtrace the emitted paths."""
        _, devs = _merge_tables(tabs, meta)
        prm = _params_dict(cfg, params)
        fin = _finalize(
            jnp, cfg, devs, hot, prm, state, jnp.bool_(True), jnp.bool_(True)
        )
        if cfg.emit_paths is None:
            out = {
                "beam_src": fin["src"],
                "logit": fin["logit"],
                "lm_score": fin["score"],
                "ctx": fin["ctx"],
                "ctx_len": fin["ctx_len"],
            }
            if pack:
                out["ptrace"] = ptrace  # host unpacks: halves the transfer
            else:
                par_raw, tr_raw = ptrace
                out["parents"] = par_raw.astype(
                    _parent_dtype(jnp, cfg.beam_width)
                )
                out["trace"] = tr_raw.astype(_path_dtype(jnp, cfg.vocab_size))
            if cfg.collect_stats:
                out["stats"] = state["stats"]
            return out
        r = cfg.emit_paths

        if pack:
            def back(cur, packed_t):
                """One reverse step on the packed log (unpack per element)."""
                entry = packed_t[cur]
                return entry & 0xFFFF, (entry >> 16) - 4
        else:
            def back(cur, xs_t):
                """One reverse step: follow parents, emit chosen tokens."""
                par_t, tok_t = xs_t
                return par_t[cur], tok_t[cur]

        xs = ptrace

        # reverse=True: forward-ordered paths with no materialized reverse
        # (see make_decode_fn; [::-1] miscompiles at some batch shapes)
        _, toks = jax.lax.scan(back, fin["src"][:r], xs, reverse=True)
        out = {
            "beam_src": fin["src"][:r],
            "logit": fin["logit"][:r],
            "lm_score": fin["score"][:r],
            "ctx": tuple(c[:r] for c in fin["ctx"]),
            "ctx_len": tuple(c[:r] for c in fin["ctx_len"]),
            # narrow on device: the path plane is the transfer payload
            "paths": toks.swapaxes(0, 1).astype(
                _path_dtype(jnp, cfg.vocab_size)
            ),  # [N, Tp]
        }
        if cfg.collect_stats:
            out["stats"] = state["stats"]
        return out

    return init_fn, seg_fn, fin_fn


def make_stream_fns(
    cfg: EngineConfig,
    tokens: TokenArrays,
    device_lms: Union[None, DeviceLM, Sequence[DeviceLM]],
) -> Tuple:
    """Build streaming primitives with a device-resident carried state.

    Returns ``(init_fn, chunk_fn, finalize_fn)``:

    * ``init_fn(start) -> state`` (per-member tuple of start dicts)
    * ``chunk_fn(state, logp [Tc,V], n_frames, params, tabs, hot) ->
      (state', parents [Tc,B], trace [Tc,B])``
    * ``finalize_fn(state, params, do_commit f32, is_end f32, tabs, hot) ->
      outputs`` (ranked view of the current hypotheses plus the committed
      carried state; ``do_commit``/``is_end`` are traced so one compilation
      serves every streaming mode). ``tabs`` is the
      :func:`build_table_args` pytree of runtime table arrays.
    """
    import jax
    import jax.numpy as jnp

    if cfg.token_timeline:
        raise ValueError(
            "the streaming API does not support token_timeline decoding "
            "(chunk_fn consumes dense logit chunks; use the batch APIs "
            "for timeline mode)"
        )
    meta = build_table_meta(device_lms)

    def init_fn(start):
        """Fresh beam state for a new stream."""
        return _init_state(jnp, cfg, start)

    def chunk_fn(state, logp, n_frames, params, tabs, hot=None):
        """Scan one logit chunk, returning the new state and backpointers."""
        tok_dev, devs = _merge_tables(tabs, meta)
        prm = _params_dict(cfg, params)
        step = _make_step(jnp, cfg, tok_dev, devs, hot, prm, n_frames)
        t_idx = jnp.arange(logp.shape[0], dtype=jnp.int32)
        state1, (parents, trace) = jax.lax.scan(step, state, (logp, t_idx))
        # narrow on device: per-chunk backpointers are the streaming
        # path's dominant device->host payload
        return (
            state1,
            parents.astype(_parent_dtype(jnp, cfg.beam_width)),
            trace.astype(_path_dtype(jnp, cfg.vocab_size)),
        )

    def finalize_fn(state, params, do_commit, is_end, tabs, hot=None):
        """Rank the current hypotheses (traced commit/eos flags)."""
        _, devs = _merge_tables(tabs, meta)
        prm = _params_dict(cfg, params)
        return _finalize(
            jnp, cfg, devs, hot, prm, state, do_commit > 0.5, is_end > 0.5
        )

    return init_fn, chunk_fn, finalize_fn
