"""Generate the parity-scale synthetic ARPA (3-gram, ~200k vocab, ~4M n-grams).

The reference's headline numbers use the pruned LibriSpeech 3-gram
(`3-gram.pruned.1e-7.arpa`: ~200k vocab, ~1.5M bigrams, ~1.1M trigrams,
ref tutorials/03_eval_performance.ipynb cells 8-9). No network access here,
so this synthesizes an ARPA with the same shape statistics; scores are
random but the probe/backoff workload matches the real model's.
"""
import os
import sys

import numpy as np

VOCAB = 200_000
BIGRAMS = 1_500_000
TRIGRAMS = 1_100_000
TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)


def make_parity_arpa(path: str, seed: int = 7) -> list:
    """Write the ARPA; returns the unigram vocabulary list."""
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = set(TRANSCRIPT.split())
    lens = rng.randint(2, 12, size=VOCAB + 20000)
    li = 0
    while len(vocab) < VOCAB:
        vocab.add("".join(rng.choice(letters, size=lens[li % len(lens)])))
        li += 1
    vocab = sorted(vocab)
    words = TRANSCRIPT.split()
    n_v = len(vocab)
    bi = rng.randint(0, n_v, size=(BIGRAMS, 2))
    tri = rng.randint(0, n_v, size=(TRIGRAMS, 3))
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={n_v + 3}\n")
        fh.write(f"ngram 2={BIGRAMS + len(words) - 1}\n")
        fh.write(f"ngram 3={TRIGRAMS + len(words) - 2}\n\n")
        fh.write("\\1-grams:\n")
        fh.write("-10\t<unk>\t0\n-2.5\t<s>\t-0.6\n-2.5\t</s>\t0\n")
        probs1 = np.round(rng.uniform(-6.0, -2.5, size=n_v), 3)
        bos1 = np.round(rng.uniform(-1.2, -0.1, size=n_v), 3)
        lines = [f"{probs1[i]}\t{w}\t{bos1[i]}\n" for i, w in enumerate(vocab)]
        fh.writelines(lines)
        fh.write("\n\\2-grams:\n")
        seen = set()
        for a, b in zip(words[:-1], words[1:]):
            if (a, b) not in seen:
                seen.add((a, b))
                fh.write(f"-0.4\t{a} {b}\t-0.3\n")
        p2 = np.round(rng.uniform(-4.0, -0.5, size=BIGRAMS), 3)
        b2 = np.round(rng.uniform(-1.0, -0.05, size=BIGRAMS), 3)
        lines = []
        for i in range(BIGRAMS):
            a, b = vocab[bi[i, 0]], vocab[bi[i, 1]]
            lines.append(f"{p2[i]}\t{a} {b}\t{b2[i]}\n")
            if len(lines) >= 100000:
                fh.writelines(lines); lines = []
        fh.writelines(lines)
        fh.write("\n\\3-grams:\n")
        for a, b, c in zip(words[:-2], words[1:-1], words[2:]):
            fh.write(f"-0.3\t{a} {b} {c}\n")
        p3 = np.round(rng.uniform(-3.0, -0.3, size=TRIGRAMS), 3)
        lines = []
        for i in range(TRIGRAMS):
            a, b, c = vocab[tri[i, 0]], vocab[tri[i, 1]], vocab[tri[i, 2]]
            lines.append(f"{p3[i]}\t{a} {b} {c}\n")
            if len(lines) >= 100000:
                fh.writelines(lines); lines = []
        fh.writelines(lines)
        fh.write("\n\\end\\\n")
    return vocab


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_3gram.arpa"
    v = make_parity_arpa(out)
    print(out, "vocab", len(v), "size_mb", round(os.path.getsize(out) / 1e6, 1))
