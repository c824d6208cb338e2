"""Device-resident LM tables: n-gram hash tables and a packed vocab trie.

The reference scores beams through per-word C++ callbacks into KenLM
(ref ``language_model.py:306-360``); a TPU cannot call back to the host per
word, so this module compiles the same model into flat arrays probed
on-device with gathers:

* **n-gram tables** — one open-addressing, linear-probing hash table per
  order. Slots store the *full* id key (exact compare, so lookups are
  collision-free), the log10 probability and the backoff weight. Linear
  probing keeps probe windows contiguous in HBM.
* **vocab trie** — a packed character trie over the LM vocabulary plus the
  known-unigram set. Beams carry their in-progress word as a trie node id;
  one gather per consumed character advances it. Node flags answer every
  string question the decoder asks: "is this partial a prefix of a known
  unigram" (ref ``language_model.py:326-336``), "what is this completed
  word's LM id", "is it in the unigram set / the LM vocab"
  (OOV rule, ref ``language_model.py:349-353``).

Everything is built host-side as numpy and moved to device once per model;
lookup functions are pure jnp and shape-static, safe under ``jit``/``scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.hashing import fnv1a
from ..ops.tokens import TokenArrays
from .language_model import LanguageModel
from .ngram import BOS_WORD, EOS_WORD, NGramTables

_MIN_TABLE = 8
_LOAD_FACTOR = 0.5

# packed hotword-trie entry layout: child node (20 bits), shortest-completion
# length (10 bits, saturating), is-hotword-terminal (bit 30)
HOT_NODE_MASK = (1 << 20) - 1
HOT_MINCOMP_SHIFT = 20
HOT_MINCOMP_MAX = 1023
HOT_WORD_BIT = 1 << 30
# every lookup gathers the table's *max* displacement worth of slots, so a
# long probe chain taxes all queries; cap it and grow the table instead.
# 8 balances probe-window width against table size (growing the table to
# force smaller windows hurts gather locality more than it saves rows)
_MAX_PROBES = 8


# --------------------------------------------------------------------------
# n-gram hash tables
# --------------------------------------------------------------------------
@dataclasses.dataclass
class HashTable:
    """One order's open-addressing table (numpy arrays)."""

    keys: np.ndarray  # int32 [size, n], -1 = empty
    probs: np.ndarray  # float32 [size]
    backoffs: np.ndarray  # float32 [size]
    max_probes: int

    @property
    def size(self) -> int:
        return int(self.keys.shape[0])

    @property
    def width(self) -> int:
        return int(self.keys.shape[1])


def _build_hash_table(
    entries: Dict[Tuple[int, ...], Tuple[np.float32, np.float32]], n: int
) -> HashTable:
    count = len(entries)
    size = _MIN_TABLE
    while size * _LOAD_FACTOR < max(count, 1):
        size *= 2
    while True:
        keys = np.full((size, n), -1, dtype=np.int32)
        probs = np.zeros(size, dtype=np.float32)
        backoffs = np.zeros(size, dtype=np.float32)
        disp = np.zeros(size, dtype=np.int32)  # robin-hood displacement
        max_probes = 1
        ok = True
        if count:
            all_keys = np.array(list(entries.keys()), dtype=np.int32).reshape(count, n)
            hashes = fnv1a(np, all_keys)
            vals = list(entries.values())
            mask = size - 1
            for row in range(count):
                # robin-hood insertion: evict shallower residents so the
                # worst-case displacement (== every lookup's window) shrinks
                key = all_keys[row]
                p_val, b_val = vals[row]
                slot = int(hashes[row]) & mask
                d = 0
                while True:
                    if keys[slot, n - 1] == -1:
                        keys[slot] = key
                        probs[slot] = p_val
                        backoffs[slot] = b_val
                        disp[slot] = d
                        max_probes = max(max_probes, d + 1)
                        break
                    if disp[slot] < d:
                        key, keys[slot] = keys[slot].copy(), key
                        p_val, probs[slot] = probs[slot], p_val
                        b_val, backoffs[slot] = backoffs[slot], b_val
                        d, disp[slot] = disp[slot], d
                        max_probes = max(max_probes, disp[slot] + 1)
                    slot = (slot + 1) & mask
                    d += 1
                    if d >= _MAX_PROBES:
                        ok = False
                        break
                if not ok:
                    break
        if ok:
            return HashTable(keys, probs, backoffs, max_probes)
        size *= 2  # displacement got pathological; rebuild sparser


def host_lookup(table: HashTable, key: np.ndarray):
    """Host (numpy) probe of one padded key; returns (found, prob, backoff)."""
    from ..ops.hashing import fnv1a

    key = np.asarray(key, dtype=np.int32).reshape(1, -1)
    h = int(fnv1a(np, key)[0])
    mask = table.size - 1
    for p in range(table.max_probes):
        slot = (h + p) & mask
        if np.array_equal(table.keys[slot], key[0]):
            return True, float(table.probs[slot]), float(table.backoffs[slot])
        if table.keys[slot, -1] == -1:
            return False, 0.0, 0.0
    return False, 0.0, 0.0


def context_suffix_backoffs(table: HashTable, order: int, ctx) -> np.ndarray:
    """Backoff weights of every suffix of ``ctx`` (right-aligned, 0 absent)."""
    width = max(order - 1, 1)
    out = np.zeros(width, dtype=np.float32)
    ctx = tuple(ctx)
    for j in range(1, len(ctx) + 1):
        key = np.full(order, -1, dtype=np.int32)
        key[order - j :] = ctx[len(ctx) - j :]
        found, _, bo = host_lookup(table, key)
        if found:
            out[width - j] = bo
    return out


def _build_unified_table(
    ngrams: List[Dict[Tuple[int, ...], Tuple[np.float32, np.float32]]], order: int
) -> HashTable:
    """All orders in one table, keys left-padded with -1 to ``order`` width.

    One padded layout means the device scores a word with a *single*
    batched probe over every suffix/backoff key instead of one lookup
    chain per order — the dominant cost of LM fusion on TPU.
    """
    combined: Dict[Tuple[int, ...], Tuple[np.float32, np.float32]] = {}
    for n, table in enumerate(ngrams, start=1):
        for key, val in table.items():
            combined[(-1,) * (order - n) + key] = val
    return _build_hash_table(combined, order)


def lookup_jnp(table_dev: Dict, query: "object", valid: "object"):
    """Probe one order's table for a batch of keys.

    ``table_dev``: dict of jnp arrays (``key_cols``/``prob``/``backoff``) plus
    the static ``max_probes``. ``query``: int32 ``[Q, n]``; ``valid``: bool
    ``[Q]``. Returns ``(found [Q] bool, prob [Q] f32, backoff [Q] f32)``.

    Layout note: key columns are *separate flat arrays* and values are split
    into flat prob/backoff planes. Gathering rows of a 2-D ``[size, n]``
    table inside a scanned loop makes XLA:TPU pick a Q-minor layout for the
    ``[Q*P, n]`` result — each 3-int row then lands megabytes apart and the
    gather runs two orders of magnitude slower than the same op standalone
    (measured: 6.6 ms vs 0.05 ms for 460k rows). Flat 1-D gathers sidestep
    the layout assignment entirely.
    """
    import jax.numpy as jnp

    cols = table_dev["key_cols"]
    n = len(cols)
    size = cols[0].shape[0]
    max_probes = table_dev["max_probes"]
    mask = size - 1
    h = fnv1a(jnp, query)
    base = (h & jnp.uint32(mask)).astype(jnp.int32)
    offs = jnp.arange(max_probes, dtype=jnp.int32)
    idx = (base[:, None] + offs[None, :]) & mask  # [Q, P]
    hit = jnp.broadcast_to(valid[:, None], idx.shape)
    for c in range(n):
        hit = hit & (cols[c][idx] == query[:, c][:, None])
    found = jnp.any(hit, axis=-1)
    sel = jnp.argmax(hit, axis=-1)
    slot = jnp.take_along_axis(idx, sel[:, None], axis=1)[:, 0]
    prob = jnp.where(found, table_dev["prob"][slot], 0.0)
    backoff = jnp.where(found, table_dev["backoff"][slot], 0.0)
    return found, prob, backoff


# --------------------------------------------------------------------------
# packed char trie
# --------------------------------------------------------------------------
@dataclasses.dataclass
class PackedTrie:
    """Char trie as flat arrays. Node 0 = root; node ``dead`` swallows."""

    next: np.ndarray  # int32 [N, n_chars]
    word_id: np.ndarray  # int32 [N] (-1: not a vocab word terminal)
    is_uni_word: np.ndarray  # bool [N] (terminal of a known-unigram)
    is_uni_prefix: np.ndarray  # bool [N] (prefix of a known-unigram)
    min_completion: np.ndarray  # int32 [N] shortest key length through node
    dead: int

    @property
    def n_nodes(self) -> int:
        return int(self.next.shape[0])


class _TrieBuilder:
    def __init__(self, n_chars: int) -> None:
        self.n_chars = n_chars
        self.next: List[np.ndarray] = [np.full(n_chars, -1, dtype=np.int64)]
        self.word_id: List[int] = [-1]
        self.is_uni_word: List[bool] = [False]
        self.is_uni_prefix: List[bool] = [False]
        self.min_completion: List[int] = [0]

    def insert(self, key_ids: List[int], depth_len: int) -> int:
        """Insert a key path; returns its terminal node id."""
        node = 0
        if self.min_completion[0] == 0 or depth_len < self.min_completion[0]:
            self.min_completion[0] = depth_len
        for cid in key_ids:
            nxt = self.next[node][cid]
            if nxt < 0:
                nxt = len(self.next)
                self.next[node][cid] = nxt
                self.next.append(np.full(self.n_chars, -1, dtype=np.int64))
                self.word_id.append(-1)
                self.is_uni_word.append(False)
                self.is_uni_prefix.append(False)
                self.min_completion.append(depth_len)
            elif depth_len < self.min_completion[nxt]:
                self.min_completion[nxt] = depth_len
            node = int(nxt)
        return node

    def pack(self) -> PackedTrie:
        """Freeze the builder into flat arrays (adds the dead node)."""
        n = len(self.next)
        dead = n
        nxt = np.full((n + 1, self.n_chars), dead, dtype=np.int32)
        table = np.stack(self.next) if n else np.zeros((0, self.n_chars), np.int64)
        nxt[:n] = np.where(table >= 0, table, dead).astype(np.int32)
        return PackedTrie(
            next=nxt,
            word_id=np.append(np.array(self.word_id, np.int32), -1),
            is_uni_word=np.append(np.array(self.is_uni_word, bool), False),
            is_uni_prefix=np.append(np.array(self.is_uni_prefix, bool), False),
            min_completion=np.append(np.array(self.min_completion, np.int32), 0),
            dead=dead,
        )


def build_vocab_trie(
    vocab: Dict[str, int],
    unigram_set,
    char2id: Dict[str, int],
    unk_id: int,
) -> PackedTrie:
    """Trie over LM vocab words (carrying word ids) and known unigrams."""
    builder = _TrieBuilder(len(char2id))

    def _ids(word: str) -> Optional[List[int]]:
        out = []
        for ch in word:
            cid = char2id.get(ch)
            if cid is None:
                return None  # contains a char no decodable string can produce
            out.append(cid)
        return out

    for word, wid in vocab.items():
        if wid == unk_id or word in (BOS_WORD, EOS_WORD):
            continue
        ids = _ids(word)
        if ids is None:
            continue
        node = builder.insert(ids, len(word))
        builder.word_id[node] = wid
    for word in unigram_set:
        ids = _ids(word)
        if ids is None:
            continue
        node = builder.insert(ids, len(word))
        builder.is_uni_word[node] = True
        # mark the whole path as a unigram prefix
        cur = 0
        builder.is_uni_prefix[0] = True
        for cid in ids:
            cur = int(builder.next[cur][cid])
            builder.is_uni_prefix[cur] = True
    return builder.pack()


def trie_seed_nodes(trie: PackedTrie, tokens: TokenArrays) -> np.ndarray:
    """Node reached from the root by each token's piece (boundary seeding)."""
    v = tokens.vocab_size
    seeds = np.zeros(v, dtype=np.int32)
    for t in range(v):
        node = 0
        for j in range(int(tokens.piece_len[t])):
            cid = int(tokens.piece_chars[t, j])
            node = int(trie.next[node, cid])
        seeds[t] = node
    return seeds


# --------------------------------------------------------------------------
# bundle
# --------------------------------------------------------------------------
@dataclasses.dataclass
class DeviceLM:
    """Everything the device scan needs to score a shallow-fusion n-gram LM."""

    order: int
    unk_id: int
    eos_id: int
    unk_prob10: float  # unigram log10 prob of <unk> (ill-formed-table fallback)
    start_ctx: np.ndarray  # int32 [order-1], right-aligned, -1 pad (<s> state)
    start_ctx_len: int
    start_ctx_backoffs: np.ndarray  # f32 [order-1], suffix backoffs of start_ctx
    table: HashTable  # unified over all orders (keys left-padded to `order`)
    trie: PackedTrie
    seed_node: np.ndarray  # int32 [V]
    has_unigrams: bool

    # bit layout of packed trie transition entries: the child node id in the
    # low 28 bits plus the child's flags, so a walk's single gather also
    # yields everything the scorer asks about the new partial word
    NODE_MASK = (1 << 28) - 1
    BIT_IN_VOCAB = 1 << 28
    BIT_UNI_WORD = 1 << 29
    BIT_UNI_PREFIX = 1 << 30

    def _node_flag_bits(self, nodes: np.ndarray) -> np.ndarray:
        bits = np.zeros(nodes.shape, dtype=np.int64)
        bits |= np.where(self.trie.word_id[nodes] >= 0, self.BIT_IN_VOCAB, 0)
        bits |= np.where(self.trie.is_uni_word[nodes], self.BIT_UNI_WORD, 0)
        bits |= np.where(self.trie.is_uni_prefix[nodes], self.BIT_UNI_PREFIX, 0)
        return bits

    def as_device(self) -> Dict:
        """jnp pytree of all arrays (call once, reuse across decodes)."""
        import jax.numpy as jnp

        if self.trie.n_nodes >= (1 << 28):
            raise ValueError("vocab trie exceeds the 2^28 packed-node limit")
        packed = (
            self.trie.next.astype(np.int64) | self._node_flag_bits(self.trie.next)
        ).astype(np.int32)
        seed_packed = (
            self.seed_node.astype(np.int64) | self._node_flag_bits(self.seed_node)
        ).astype(np.int32)
        return {
            "utable": {
                # flat per-column key planes + split value planes: see the
                # lookup_jnp layout note (2-D row gathers are pathological
                # inside scanned loops on TPU)
                "key_cols": tuple(
                    jnp.asarray(np.ascontiguousarray(self.table.keys[:, c]))
                    for c in range(self.table.width)
                ),
                "prob": jnp.asarray(self.table.probs),
                "backoff": jnp.asarray(self.table.backoffs),
                "max_probes": self.table.max_probes,
            },
            "trie_next": jnp.asarray(packed),
            "trie_word_id": jnp.asarray(self.trie.word_id),
            "seed_node": jnp.asarray(seed_packed),
            "start_ctx": jnp.asarray(self.start_ctx),
        }


def build_device_lm(language_model: LanguageModel, tokens: TokenArrays) -> DeviceLM:
    """Compile a :class:`LanguageModel` into :class:`DeviceLM` tables.

    Two sources feed the same device layout: the pure-Python
    :class:`NGramTables` (hash tables built here) or the native C++ engine
    (tables exported directly — identical slot layout by construction).
    """
    from .native import NativeNGramModel

    ngram = language_model.ngram_model
    if isinstance(ngram, NativeNGramModel):
        nat = ngram.native
        order = nat.order
        unk_id = nat.unk_id
        eos_id = nat.eos_id if nat.eos_id >= 0 else unk_id
        unk_prob10 = nat.unk_prob10
        e = nat.export_unified()
        table = HashTable(
            keys=e["keys"],
            probs=e["probs"],
            backoffs=e["backoffs"],
            max_probes=e["max_probes"],
        )
        vocab = {w: i for i, w in enumerate(nat.vocab_list())}
        bos_state = ngram.begin_sentence_state()
    else:
        tables_py: NGramTables = ngram.tables
        order = tables_py.order
        unk_id = tables_py.unk_id
        eos_id = tables_py.vocab.get(EOS_WORD, unk_id)
        uni_unk = tables_py.ngrams[0].get((unk_id,))
        unk_prob10 = float(uni_unk[0]) if uni_unk is not None else -99.0
        table = _build_unified_table(tables_py.ngrams, order)
        vocab = tables_py.vocab
        bos_state = tables_py.begin_sentence_state()

    # the trie's char ids must extend the token char map with vocab-only chars
    char2id = dict(tokens.char2id)
    for word in vocab:
        for ch in word:
            if ch not in char2id:
                char2id[ch] = len(char2id)
    for word in language_model.unigram_set:
        for ch in word:
            if ch not in char2id:
                char2id[ch] = len(char2id)
    trie = build_vocab_trie(vocab, language_model.unigram_set, char2id, unk_id)
    seed_node = trie_seed_nodes(trie, tokens)
    ctx_width = max(order - 1, 1)
    start_ctx = np.full(ctx_width, -1, dtype=np.int32)
    for i, wid in enumerate(bos_state):
        start_ctx[ctx_width - len(bos_state) + i] = wid
    return DeviceLM(
        order=order,
        unk_id=unk_id,
        eos_id=eos_id,
        unk_prob10=unk_prob10,
        start_ctx=start_ctx,
        start_ctx_len=len(bos_state),
        start_ctx_backoffs=context_suffix_backoffs(table, order, bos_state),
        table=table,
        trie=trie,
        seed_node=seed_node,
        has_unigrams=len(language_model.unigram_set) > 0,
    )


def build_hotword_tables(
    hotword_unigrams,
    char2id: Dict[str, int],
    tokens: TokenArrays,
    min_nodes: int = 8,
) -> Dict[str, np.ndarray]:
    """Per-call hotword trie as traced device arrays (ref language_model.py:115-189).

    Hotwords change per decode call, so these arrays are *inputs* to the
    compiled program, not baked constants; node counts are padded to powers
    of two so different hotword sets of similar size reuse one executable.
    ``next``/``seed`` entries are packed (child node id + the child's
    shortest-completion length + terminal flag, see ``HOT_NODE_MASK``) so a
    walk's single gather also answers every scoring question. ``dead`` is
    the swallowing node id.
    """
    builder = _TrieBuilder(len(char2id))
    for word in hotword_unigrams:
        ids = []
        ok = True
        for ch in word:
            cid = char2id.get(ch)
            if cid is None:
                ok = False
                break
            ids.append(cid)
        if not ok:
            continue  # contains an undecodable char: can never match
        node = builder.insert(ids, len(word))
        builder.is_uni_word[node] = True
    trie = builder.pack()
    if trie.n_nodes >= (1 << 20):
        raise ValueError("hotword trie exceeds the 2^20 packed-node limit")

    def _pack(nodes: np.ndarray) -> np.ndarray:
        mc = np.minimum(trie.min_completion[nodes], HOT_MINCOMP_MAX).astype(np.int64)
        bits = nodes.astype(np.int64) | (mc << HOT_MINCOMP_SHIFT)
        bits |= np.where(trie.is_uni_word[nodes], HOT_WORD_BIT, 0)
        return bits.astype(np.int32)

    n = trie.n_nodes  # includes the dead node
    n_pad = min_nodes
    while n_pad < n:
        n_pad *= 2
    nxt = np.full(
        (n_pad, trie.next.shape[1]),
        int(_pack(np.array([trie.dead]))[0]),
        dtype=np.int32,
    )
    nxt[:n] = _pack(trie.next)
    return {
        "next": nxt,
        "seed": _pack(trie_seed_nodes(trie, tokens)),
        "dead": np.int32(trie.dead),
    }


def empty_hotword_tables(tokens: TokenArrays) -> Dict[str, np.ndarray]:
    """No-hotword stand-in (root-only trie; every walk lands dead)."""
    return build_hotword_tables([], tokens.char2id, tokens)


def lm_score_words_jnp(
    dev: Dict,
    order: int,
    unk_prob10: float,
    ctx: "object",
    ctx_len: "object",
    wid: "object",
    ctx_backoffs: "object" = None,
):
    """Batched KenLM-``BaseScore``-equivalent on device.

    ``ctx``: int32 ``[Q, order-1]`` right-aligned (-1 pad), ``ctx_len [Q]``,
    ``wid [Q]``. Returns ``(raw10 [Q] f32, out_ctx [Q, order-1], out_len [Q],
    out_backoffs [Q, order-1])`` matching :meth:`NGramTables.raw_score`
    bit-for-bit on float32.

    ``ctx_backoffs`` holds the backoff weights of every context suffix
    (right-aligned like ``ctx``; 0 where absent). Because the outgoing
    state is always a suffix of ``full``, the out-state's suffix backoffs
    fall out of the same probe — so a beam that carries them never probes
    context keys again, cutting queries per word from ``2*order - 1`` to
    ``order``. Pass ``None`` to self-probe the context keys instead
    (stateless callers).
    """
    import jax.numpy as jnp

    ctx_width = max(order - 1, 1)
    q = wid.shape[0]
    if order == 1:
        full = wid[:, None].astype(jnp.int32)
        found, prob, _ = lookup_jnp(dev["utable"], full, jnp.ones((q,), bool))
        score = jnp.where(found, prob, jnp.float32(unk_prob10))
        zeros = jnp.zeros((q,), dtype=jnp.int32)
        zbo = jnp.zeros((q, ctx_width), dtype=jnp.float32)
        return score.astype(jnp.float32), jnp.full_like(ctx, -1), zeros, zbo

    full = jnp.concatenate([ctx, wid[:, None].astype(jnp.int32)], axis=1)  # [Q, order]
    k = ctx_len  # number of context words
    pos = jnp.arange(order, dtype=jnp.int32)[None, :]

    queries = []
    valids = []
    for n in range(1, order + 1):  # full-suffix keys, length n
        queries.append(jnp.where(pos >= order - n, full, -1))
        valids.append((k + 1) >= n)
    if ctx_backoffs is None:
        # stateless path: also probe the context-suffix keys for backoffs
        ctx_pad = jnp.concatenate(
            [jnp.full((q, 1), -1, dtype=jnp.int32), ctx.astype(jnp.int32)], axis=1
        )
        for j in range(1, order):
            queries.append(jnp.where(pos >= order - j, ctx_pad, -1))
            valids.append(k >= j)
    nq = len(queries)
    allq = jnp.stack(queries, axis=1).reshape(q * nq, order)
    allv = jnp.stack(valids, axis=1).reshape(q * nq)
    found, prob, backoff = lookup_jnp(dev["utable"], allq, allv)
    found = found.reshape(q, nq)
    prob = prob.reshape(q, nq)
    backoff = backoff.reshape(q, nq)

    # longest match over full suffixes
    matched = jnp.zeros_like(k)
    best_prob = jnp.zeros((q,), dtype=jnp.float32)
    for n in range(1, order + 1):
        take = found[:, n - 1]
        matched = jnp.where(take, n, matched)
        best_prob = jnp.where(take, prob[:, n - 1], best_prob)
    no_match = matched == 0
    best_prob = jnp.where(no_match, jnp.float32(unk_prob10), best_prob)
    matched = jnp.where(no_match, 1, matched)

    # backoff accumulation over unmatched context suffixes, ascending j
    # (sequential f32 adds in the same order as the host scorer); the
    # suffix-j backoff sits right-aligned at column ctx_width - j when
    # carried on the beam
    score = best_prob
    for j in range(1, order):
        if ctx_backoffs is None:
            col = order + j - 1
            bo_j = jnp.where(found[:, col], backoff[:, col], 0.0)
        else:
            bo_j = ctx_backoffs[:, ctx_width - j]
        use = (j >= matched) & (j <= k)
        score = jnp.where(use, (score + bo_j).astype(jnp.float32), score)

    # outgoing state: longest suffix of `full` present, capped at order-1
    out_n = jnp.zeros_like(k)
    for n in range(1, order):
        out_n = jnp.where(found[:, n - 1], n, out_n)
    positions = jnp.arange(ctx_width)[None, :]
    tail = full[:, 1:]
    out_ctx = jnp.where(positions >= (ctx_width - out_n[:, None]), tail, -1)
    # out-state suffix backoffs: suffix j of the out state == full suffix j
    # (valid for j <= out_n); right-aligned at column ctx_width - j
    out_bo_cols = []
    for col in range(ctx_width):
        j = ctx_width - col
        bo = jnp.where(
            (j <= out_n) & found[:, j - 1], backoff[:, j - 1], 0.0
        )
        out_bo_cols.append(bo)
    out_backoffs = jnp.stack(out_bo_cols, axis=1).astype(jnp.float32)
    return score, out_ctx.astype(jnp.int32), out_n.astype(jnp.int32), out_backoffs
